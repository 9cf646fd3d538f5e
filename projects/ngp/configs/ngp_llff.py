# Instant-NGP on LLFF fern (real forward-facing capture).
_base_ = "ngp_base.py"
exp_name = "fern"
dataset_dir = "data/nerf_llff_data/fern"
dataset_type = "LLFFDataset"
dataset = dict(
    _cover_=True,
    train=dict(type=dataset_type, root_dir=dataset_dir, batch_size=4096,
               mode="train", factor=8, llffhold=8, aabb_scale=64),
    val=dict(type=dataset_type, root_dir=dataset_dir, batch_size=4096,
             mode="val", factor=8, llffhold=8, aabb_scale=64,
             preload_shuffle=False),
    test=dict(type=dataset_type, root_dir=dataset_dir, batch_size=4096,
              mode="test", factor=8, llffhold=8, aabb_scale=64,
              preload_shuffle=False),
)
const_dt = False
fp16 = True
