# Plenoxels (svox2) on blender lego: SH voxel grid, two-group optimizer.
# Key surface mirrors `contrib/plenoxel/projects/svox2/configs/svox2_base.py`.

exp_name = "lego_svox2"
log_dir = "./logs"
background_color = [0, 0, 0]
fp16 = True
load_ckpt = False
ckpt_path = None
alpha_image = False

reso_list = [[256] * 3, [512] * 3]
epoch_size = 12800
batch_size = 5000

lr_sigma = 30.0
lr_sigma_final = 0.05
lr_sigma_decay_steps = 250000
lr_sigma_delay_steps = 15000
lr_sigma_delay_mult = 0.01
lr_sh = 0.01
lr_sh_final = 5e-06
lr_sh_decay_steps = 250000
lr_sh_delay_steps = 0
lr_sh_delay_mult = 0.01
lr_decay = True

lambda_tv = 1e-05
lambda_tv_sh = 0.001
rms_beta = 0.95
init_sigma = 0.1
sigma_thresh = 1e-08
step_size = 0.5
stop_thresh = 1e-07
background_brightness = 1.0
near_clip = 0.0
upsamp_every = 38400
density_thresh = 5.0
weight_thresh = 0.256
thresh_type = "weight"
n_iters = 128000

model = dict(type="SparseGrid", reso=256, radius=1.3, basis_dim=9,
             basis_reso=32, nosphereinit=False)

dataset_type = "SvoxNeRFDataset"
dataset_dir = "data/lego"
dataset = dict(
    train=dict(type=dataset_type, root=dataset_dir, split="train",
               epoch_size=epoch_size * batch_size),
    test=dict(type=dataset_type, root=dataset_dir, split="test",
              epoch_size=epoch_size * batch_size),
)

loss = dict(type="MSELoss")
