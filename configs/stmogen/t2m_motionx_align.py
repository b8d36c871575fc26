# Small STMoGen on Motion-X HumanML3D-aligned only — no mix, no face_no_loss
# (reference configs/stmogen/T2M_motionx_align.py: motionx_bs128 base,
# latent 64x12, ff 256, 4 layers, ann humanml3d_align_train_val.txt)
_base_ = ['./t2m_motionx_mix.py']

face_no_loss = False
model = dict(face_no_loss=False)

# single-dataset Motion-X data (replaces the inherited mix tree; values from
# configs/_base_/datasets/motionx_bs128.py)
_data_keys = ['motion', 'motion_mask', 'motion_length']
_pipeline = [
    dict(type='Normalize',
         mean_path='./data/datasets/motionx/humanml3d_align_mean.npy',
         std_path='./data/datasets/motionx/humanml3d_align_std.npy'),
    dict(type='Crop', crop_size=196),
    dict(type='ToTensor', keys=_data_keys),
    dict(type='Collect', keys=_data_keys, meta_keys=['text', 'token']),
]
data = dict(
    samples_per_gpu=128,
    train=dict(_delete_=True, type='RepeatDataset',
               dataset=dict(type='TextMotionDataset', dataset_name='motionx',
                            data_prefix='./data', pipeline=_pipeline,
                            ann_file='humanml3d_align_train_val.txt',
                            motion_dir='motion_data/smplx_322',
                            text_dir='texts/semantic_labels'),
               times=100),
)
