# Speech-to-gesture ControlNet over the 0.25B (8-layer) T2M base
# (reference configs/stmogen/S2G_Beats2_no_face_loss_025b.py:33-34,126)
_base_ = ['./s2g_beats2_0125b.py']

model = dict(model=dict(base_model=dict(num_layers=8)))
data = dict(samples_per_gpu=64)
base_checkpoint = './outputs/t2m_0_25b/params.npz'
