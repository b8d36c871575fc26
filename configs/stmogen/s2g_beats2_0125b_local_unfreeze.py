# S2G ControlNet with selective base unfreeze: only root/trans/body/face/hand
# pose heads train in the base model (reference
# configs/stmogen/S2G_Beats2_no_face_loss_0125b_local_unfreeze.py:38,127)
_base_ = ['./s2g_beats2_0125b.py']

model = dict(model=dict(unfreeze_mode='root_face_hand'))
data = dict(samples_per_gpu=96)
