# Tiny M2D smoke config
_base_ = ['./tiny_s2g.py']
model = dict(model=dict(control_cond_feats=163,
                        condition_encode_cfg=dict(dataset_name='finedance',
                                                  condition_pre_encode=False,
                                                  control_cond_feats=163,
                                                  condition_cfg=True)))
data = dict(
    samples_per_gpu=2,
    test=dict(type='FinedanceMotionDataset', dataset_name='finedance',
              data_prefix='./data_tiny', _delete_=True,
              pipeline=[dict(type='Normalize',
                             mean_path='./data_tiny/datasets/finedance/mean.npy',
                             std_path='./data_tiny/datasets/finedance/std.npy'),
                        dict(type='ContrlCrop', crop_size=16),
                        dict(type='Collect',
                             keys=['motion', 'motion_mask', 'motion_length'],
                             meta_keys=['text'])],
              ann_file='test.txt', motion_dir='motion_fea163',
              text_dir='label_json', datasplit='cross_genre', music_dir='music_npy'),
)
windowed = dict(window=16, pre_frames=4)
