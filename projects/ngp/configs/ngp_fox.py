# Instant-NGP on the fox real capture (multi-cascade aabb, cone-angle dt).
_base_ = "ngp_base.py"
exp_name = "fox"
dataset_dir = "data/fox"
dataset = dict(
    train=dict(root_dir=dataset_dir),
    val=dict(_cover_=True, type="NerfDataset", root_dir=dataset_dir,
             batch_size=4096, mode="train", preload_shuffle=False),
    test=dict(root_dir=dataset_dir),
)
aabb_scale = 4
# Real captures converge better with cone-angle-scaled steps.
const_dt = False
fp16 = True
