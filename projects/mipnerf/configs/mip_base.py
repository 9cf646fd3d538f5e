# Mip-NeRF on blender lego (cone casting + IPE, 2 levels x 128 samples).
# Key surface mirrors `contrib/mipnerf/projects/mipnerf/configs/mip_base.py`.

exp_name = "lego_mip"
log_dir = "./logs"

sampler = dict(type="MipSampler")
model = dict(type="MipNerfMLP")
loss = dict(type="MSELoss")
optim = dict(type="Adam", lr=8e-3, eps=1e-15, betas=(0.9, 0.99))
linearlog = dict(
    type="LinearLog",
    end_lr=5e-6,
    max_steps=40001,
    lr_delay_steps=2500,
    lr_delay_mult=0.01,
)

dataset_type = "Blender"
dataset_dir = "nerf_data/nerf_synthetic/lego/"
dataset = dict(
    train=dict(type=dataset_type, root_dir=dataset_dir, batch_size=4096,
               mode="train"),
    val=dict(type=dataset_type, root_dir=dataset_dir, batch_size=4096,
             mode="val", preload_shuffle=False),
    test=dict(type=dataset_type, root_dir=dataset_dir, batch_size=4096,
              mode="test", preload_shuffle=False),
)

tot_train_steps = 40001
background_color = [0, 0, 0]
n_rays_per_batch = 4096
white_bkgd = False
using_fp16 = False
fp16 = False
load_ckpt = False
ckpt_path = None

num_levels = 2
num_samples = 128
net_depth = 8
skip_layer = 4
net_width = 256
net_depth_condition = 1
net_width_condition = 128
num_density_channels = 1
num_rgb_channels = 3
resample_padding = 0.01
lindisp = False
ray_shape = "cone"
min_deg_point = 0
max_deg_point = 8
coarse_loss_mult = 0.1
disable_multiscale_loss = False
randomized = True
disable_integration = False
use_viewdirs = True
deg_view = 4
density_noise = 0.0
density_bias = -1.0
rgb_padding = 0.001
stop_level_grad = True
near = 2.0
far = 6.0
