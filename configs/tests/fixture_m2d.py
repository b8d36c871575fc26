# Tiny M2D config over the COMMITTED real-format FineDance fixture
# (tests/fixtures/mini — regenerate via tools/make_tiny_data.py --fixtures).
_base_ = ['./tiny_m2d.py']
data = dict(
    test=dict(data_prefix='./tests/fixtures/mini',
              pipeline=[dict(type='Normalize',
                             mean_path='./tests/fixtures/mini/datasets/finedance/mean.npy',
                             std_path='./tests/fixtures/mini/datasets/finedance/std.npy'),
                        dict(type='ContrlCrop', crop_size=16),
                        dict(type='Collect',
                             keys=['motion', 'motion_mask', 'motion_length'],
                             meta_keys=['text'])]),
)
