# MCM ControlNet for M2D (reference configs/mcm/mcm_m2d_finedance.py)
_base_ = ['./mcm_s2g_beats2.py', '../_base_/datasets/finedance_bs128.py']
control_cond_feats = 163
model = dict(model=dict(control_cond_feats=163,
                        condition_encode_cfg=dict(dataset_name='finedance',
                                                  condition_pre_encode=False,
                                                  control_cond_feats=163,
                                                  condition_cfg=True)))
windowed = dict(window=196, pre_frames=30)
