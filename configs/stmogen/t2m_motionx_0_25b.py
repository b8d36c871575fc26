# 0.25B variant: 8 layers (reference ...0_25b.py)
_base_ = ['./t2m_motionx_0_125b.py']
model = dict(model=dict(num_layers=8))
runner = dict(type='EpochBasedRunner', max_epochs=12)
