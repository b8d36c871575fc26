# Step-cache calibration harness for the FLAGSHIP model (VERDICT r3 item 4):
# inherits the exact 0.125B STMoGen topology + DDIM respace from
# ../stmogen/t2m_motionx_0_125b.py and swaps only the data tree for the
# synthetic protocol-shape clips (196x322) written by
# `tools/make_tiny_data.py --root ./data_protocol_gt --protocol-gt`, so the
# probe runs in any environment without the real Motion-X assets.  Used by
# tools/calibrate_step_cache.py to produce artifacts/step_cache_flagship.json
# (and by tests/test_step_cache_calibration.py to regenerate it).
_base_ = ['../stmogen/t2m_motionx_0_125b.py']

data_keys = ['motion', 'motion_mask', 'motion_length']
meta_keys = ['text']
pipeline = [
    dict(type='Normalize',
         mean_path='./data_protocol_gt/datasets/motionx/mean.npy',
         std_path='./data_protocol_gt/datasets/motionx/std.npy'),
    dict(type='Crop', crop_size=196),
    dict(type='ToTensor', keys=data_keys[:2]),
    dict(type='Collect', keys=data_keys, meta_keys=meta_keys),
]
data = dict(
    samples_per_gpu=8,
    test=dict(type='TextMotionDataset', dataset_name='motionx',
              data_prefix='./data_protocol_gt', pipeline=pipeline,
              ann_file='ann.txt', motion_dir='motions', text_dir='texts',
              # test_mode=False skips prepare_evaluation(): the probe only
              # needs batches, and the base eval_cfg references real assets
              test_mode=False),
)
