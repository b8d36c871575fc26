# BEAT2 speech-gesture data (reference configs/_base_/datasets/beats2_bs128.py)
data_keys = ['motion', 'motion_mask', 'motion_length']
meta_keys = ['text']
speech_train_pipeline = [
    dict(type='Normalize',
         mean_path='./data/datasets/beats2/PantoMatrix/mean.npy',
         std_path='./data/datasets/beats2/PantoMatrix/std.npy'),
    dict(type='ContrlCrop', crop_size=196),
    dict(type='ToTensor', keys=data_keys[:2]),
    dict(type='Collect', keys=data_keys, meta_keys=meta_keys),
]
data = dict(
    samples_per_gpu=128,
    workers_per_gpu=1,
    train=dict(type='SpeechMotionDataset', dataset_name='beats2',
               data_prefix='./data', pipeline=speech_train_pipeline,
               ann_file='train.txt', motion_dir='motions', text_dir='texts',
               ann_config='configs/beat2/st_mogen_emage.yaml'),
    test=dict(type='SpeechMotionDataset', dataset_name='beats2',
              data_prefix='./data', pipeline=speech_train_pipeline,
              ann_file='test.txt', motion_dir='motions', text_dir='texts',
              ann_config='configs/beat2/st_mogen_emage.yaml', test_mode=False),
)
