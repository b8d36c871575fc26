# Music-to-dance ControlNet, 0.125B (reference
# configs/stmogen/M2D_finedance_no_face_loss_0125b.py): 163-d music features,
# no wav pre-encoder, 120-frame windows with 30 overlap
_base_ = ['./s2g_beats2_0125b.py']

checkpoint_config = dict(interval=8)
runner = dict(type='EpochBasedRunner', max_epochs=256)

control_cond_feats = 163
model = dict(model=dict(control_cond_feats=163,
                        condition_encode_cfg=dict(_delete_=True,
                                                  dataset_name='nothing',
                                                  condition_pre_encode=False,
                                                  condition_pre_encode_type='nothing',
                                                  control_cond_feats=163,
                                                  condition_cfg=True)))

# FineDance data replaces the inherited BEAT2 tree
# (reference configs/_base_/datasets/finedance_bs128.py)
_data_keys = ['motion', 'motion_mask', 'motion_length']
_pipeline = [
    dict(type='Normalize',
         mean_path='./data/datasets/finedance/mean.npy',
         std_path='./data/datasets/finedance/std.npy'),
    dict(type='ContrlCrop', crop_size=196, stride=30),
    dict(type='ToTensor', keys=_data_keys[:2]),
    dict(type='Collect', keys=_data_keys, meta_keys=['text']),
]
data = dict(
    samples_per_gpu=84,
    workers_per_gpu=1,
    train=dict(_delete_=True, type='FinedanceMotionDataset',
               dataset_name='finedance', data_prefix='./data',
               pipeline=_pipeline, ann_file='train.txt',
               motion_dir='motion_fea163', text_dir='label_json',
               datasplit='cross_genre', music_dir='music_npy'),
    test=dict(_delete_=True, type='FinedanceMotionDataset',
              dataset_name='finedance', data_prefix='./data',
              pipeline=_pipeline, ann_file='test.txt',
              motion_dir='motion_fea163', text_dir='label_json',
              datasplit='cross_genre', music_dir='music_npy'),
)
base_checkpoint = './outputs/t2m_0_125b/params.npz'
windowed = dict(window=120, pre_frames=30, pose_fps=30)
