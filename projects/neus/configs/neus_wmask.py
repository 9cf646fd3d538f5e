# NeuS with mask supervision: same as womask but mask BCE enabled.
_base_ = "neus_womask.py"
base_exp_dir = "./log/dtu_scan24/wmask"
mask_weight = 0.1
