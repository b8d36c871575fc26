# Motion-X SMPL-X 322 (reference configs/_base_/datasets/motionx_bs128.py)
_base_ = ['./motionx_mix_bs128.py']
