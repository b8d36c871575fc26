# Music-to-dance ControlNet (reference configs/stmogen/M2D_finedance_no_face_loss_0125b.py):
# 163-d music features, no wav pre-encoder, 120-frame windows with 30 overlap
_base_ = ['./s2g_beats2_0125b.py']
control_cond_feats = 163
model = dict(model=dict(control_cond_feats=163,
                        condition_encode_cfg=dict(dataset_name='finedance',
                                                  condition_pre_encode=False,
                                                  control_cond_feats=163,
                                                  condition_cfg=True)))
data = dict(train={'_delete_': False},)
windowed = dict(window=120, pre_frames=30, pose_fps=30)
