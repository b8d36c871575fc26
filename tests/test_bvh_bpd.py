"""BVH parser + VLB/BPD utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from motioncraft_tpu.data.bvh import parse_bvh
from motioncraft_tpu.diffusion import create_diffusion
from motioncraft_tpu.diffusion.gaussian import calc_bpd_loop, prior_bpd, vb_terms_bpd
from motioncraft_tpu.diffusion.schedules import get_schedule


def test_bvh_roundtrip(tmp_path):
    bvh = """HIERARCHY
ROOT Hips
{
  OFFSET 0.0 0.0 0.0
  CHANNELS 6 Xposition Yposition Zposition Zrotation Xrotation Yrotation
  JOINT Spine
  {
    OFFSET 0.0 10.0 0.0
    CHANNELS 3 Zrotation Xrotation Yrotation
    End Site
    {
      OFFSET 0.0 5.0 0.0
    }
  }
}
MOTION
Frames: 2
Frame Time: 0.033333
0 0 0 0 0 0 10 20 30
1 2 3 4 5 6 7 8 9
"""
    p = tmp_path / "test.bvh"
    p.write_text(bvh)
    data = parse_bvh(str(p))
    assert [j.name for j in data.joints] == ["Hips", "Spine", "Spine_end"]
    assert data.frames.shape == (2, 9)
    np.testing.assert_array_equal(data.parents, [-1, 0, 1])
    np.testing.assert_allclose(data.joint_channels("Spine")[0], [10, 20, 30])
    assert abs(data.frame_time - 0.033333) < 1e-9


def test_plain_schedule():
    ts = get_schedule(10, -1, n_sample=2, n_steplength=2)
    assert ts[0] == 10 and ts[-1] == -1
    for a, b in zip(ts[:-1], ts[1:]):
        assert abs(a - b) == 1


def test_bpd_loop_runs(rng):
    d = create_diffusion(diffusion_steps=50, beta_scheduler="cosine",
                         model_mean_type="epsilon", model_var_type="fixed_small")
    x0 = jnp.asarray(rng.randn(2, 4, 3), jnp.float32)
    model_fn = lambda x, t: jnp.zeros_like(x)
    out = calc_bpd_loop(d, model_fn, x0, jax.random.PRNGKey(0))
    assert out["vb"].shape == (2, 50)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()
    assert (np.asarray(prior_bpd(d, x0)) >= 0).all()
