# M2D ControlNet with selective base unfreeze: root/trans/body/hand heads
# (reference configs/stmogen/M2D_finedance_no_face_loss_0125b_local_unfreeze.py:38)
_base_ = ['./m2d_finedance_0125b.py']

checkpoint_config = dict(interval=12)
model = dict(model=dict(unfreeze_mode='root_hand'))
