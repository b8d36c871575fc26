"""Gaussian diffusion engine — TPU-native redesign of the guided-diffusion port.

The reference engine (/root/reference/mogen/models/utils/gaussian_diffusion.py:
319-1463) is a stateful python class with a python loop over timesteps.  Here
the engine is a frozen pytree of schedule tables (computed on host in float64,
cast once to f32 — same numerics as the reference's per-lookup cast) plus pure
functions, so whole sampling loops compile to a single ``lax.scan``
(see sampling.py).  Timestep respacing (SpacedDiffusion, :1407-1448) is folded
into the tables: ``timestep_map`` carries respaced->original indices and the
model is always called with original-space timesteps (_WrappedModel, :1451-1463).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .schedules import get_named_beta_schedule, space_timesteps

# Model output parameterisations / variance types (ModelMeanType / ModelVarType
# enums at gaussian_diffusion.py:283-304), kept as strings for static hashing.
MEAN_TYPES = ("previous_x", "start_x", "epsilon")
VAR_TYPES = ("learned", "fixed_small", "fixed_large", "learned_range")


@struct.dataclass
class GaussianDiffusion:
    """Schedule tables (pytree leaves) + static config (pytree aux)."""

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # fixed_large variance = append(posterior_variance[1], betas[1:]) (:520-527)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    log_betas: jnp.ndarray
    # respaced index -> original timestep (identity when not respaced)
    timestep_map: jnp.ndarray

    model_mean_type: str = struct.field(pytree_node=False, default="start_x")
    model_var_type: str = struct.field(pytree_node=False, default="fixed_large")
    num_timesteps: int = struct.field(pytree_node=False, default=1000)
    original_num_steps: int = struct.field(pytree_node=False, default=1000)
    rescale_timesteps: bool = struct.field(pytree_node=False, default=False)


def create_diffusion(
    betas: Optional[np.ndarray] = None,
    *,
    beta_scheduler: str = "linear",
    diffusion_steps: int = 1000,
    model_mean_type: str = "start_x",
    model_var_type: str = "fixed_large",
    respace: Optional[Union[str, Sequence[int]]] = None,
    rescale_timesteps: bool = False,
    dtype=jnp.float32,
) -> GaussianDiffusion:
    """Build the table pytree; all derivations in float64 on host (:353-387)."""
    if betas is None:
        betas = get_named_beta_schedule(beta_scheduler, diffusion_steps)
    betas = np.asarray(betas, dtype=np.float64)
    if betas.ndim != 1 or not ((betas > 0).all() and (betas <= 1).all()):
        raise ValueError(
            f"betas must be 1-D in (0, 1]; got shape {betas.shape}, "
            f"range [{betas.min():.4g}, {betas.max():.4g}] "
            f"(the scaled linear schedule needs diffusion_steps >= 50)")
    original_num_steps = len(betas)

    if respace is not None:
        use_timesteps = space_timesteps(original_num_steps, respace)
        base_alphas_cumprod = np.cumprod(1.0 - betas)
        last_alpha_cumprod = 1.0
        new_betas, timestep_map = [], []
        for i, alpha_cumprod in enumerate(base_alphas_cumprod):
            if i in use_timesteps:
                new_betas.append(1 - alpha_cumprod / last_alpha_cumprod)
                last_alpha_cumprod = alpha_cumprod
                timestep_map.append(i)
        betas = np.array(new_betas, dtype=np.float64)
        timestep_map = np.array(timestep_map, dtype=np.int32)
    else:
        timestep_map = np.arange(original_num_steps, dtype=np.int32)

    num_timesteps = len(betas)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    posterior_log_variance_clipped = np.log(np.append(posterior_variance[1], posterior_variance[1:]))
    fixed_large_variance = np.append(posterior_variance[1], betas[1:])

    as_dev = lambda a: jnp.asarray(a, dtype=dtype)
    return GaussianDiffusion(
        betas=as_dev(betas),
        alphas_cumprod=as_dev(alphas_cumprod),
        alphas_cumprod_prev=as_dev(alphas_cumprod_prev),
        alphas_cumprod_next=as_dev(alphas_cumprod_next),
        sqrt_alphas_cumprod=as_dev(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=as_dev(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=as_dev(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=as_dev(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=as_dev(posterior_variance),
        posterior_log_variance_clipped=as_dev(posterior_log_variance_clipped),
        posterior_mean_coef1=as_dev(betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)),
        posterior_mean_coef2=as_dev((1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)),
        fixed_large_variance=as_dev(fixed_large_variance),
        fixed_large_log_variance=as_dev(np.log(fixed_large_variance)),
        log_betas=as_dev(np.log(betas)),
        timestep_map=jnp.asarray(timestep_map),
        model_mean_type=model_mean_type,
        model_var_type=model_var_type,
        num_timesteps=num_timesteps,
        original_num_steps=original_num_steps,
        rescale_timesteps=rescale_timesteps,
    )


def build_diffusion(cfg: dict) -> GaussianDiffusion:
    """Config-dict constructor matching the reference schema
    (diffusion_architecture.py:25-54): ``dict(beta_scheduler=..., diffusion_steps=...,
    model_mean_type=..., model_var_type=..., respace=...)``."""
    return create_diffusion(
        beta_scheduler=cfg["beta_scheduler"],
        diffusion_steps=cfg["diffusion_steps"],
        model_mean_type=cfg["model_mean_type"],
        model_var_type=cfg["model_var_type"],
        respace=cfg.get("respace", None),
    )


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """table[t] broadcast to an ndim-rank batch shape (gaussian_diffusion.py:1330-1343)."""
    out = jnp.take(table, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - out.ndim))


def model_timesteps(d: GaussianDiffusion, t: jnp.ndarray) -> jnp.ndarray:
    """Respaced -> original timesteps as seen by the denoiser (_WrappedModel)."""
    ts = jnp.take(d.timestep_map, t, axis=0)
    if d.rescale_timesteps:
        ts = ts.astype(jnp.float32) * (1000.0 / d.original_num_steps)
    return ts


def q_mean_variance(d: GaussianDiffusion, x_start, t):
    mean = _extract(d.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
    variance = _extract(1.0 - d.alphas_cumprod, t, x_start.ndim)
    log_variance = _extract(d.log_one_minus_alphas_cumprod, t, x_start.ndim)
    return mean, variance, log_variance


def q_sample(d: GaussianDiffusion, x_start, t, noise):
    """Sample q(x_t | x_0) (:406-423)."""
    return (_extract(d.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(d.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise)


def undo(d: GaussianDiffusion, x, t, rng):
    """One forward (re-noising) step used by RePaint time travel (:426-435)."""
    beta = _extract(d.betas, t, x.ndim)
    return jnp.sqrt(1 - beta) * x + jnp.sqrt(beta) * jax.random.normal(rng, x.shape, x.dtype)


def q_posterior_mean_variance(d: GaussianDiffusion, x_start, x_t, t):
    posterior_mean = (_extract(d.posterior_mean_coef1, t, x_t.ndim) * x_start
                      + _extract(d.posterior_mean_coef2, t, x_t.ndim) * x_t)
    posterior_variance = _extract(d.posterior_variance, t, x_t.ndim)
    posterior_log_variance = _extract(d.posterior_log_variance_clipped, t, x_t.ndim)
    return posterior_mean, posterior_variance, posterior_log_variance


def predict_xstart_from_eps(d: GaussianDiffusion, x_t, t, eps):
    return (_extract(d.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t
            - _extract(d.sqrt_recipm1_alphas_cumprod, t, x_t.ndim) * eps)


def predict_xstart_from_xprev(d: GaussianDiffusion, x_t, t, xprev):
    return (_extract(1.0 / d.posterior_mean_coef1, t, x_t.ndim) * xprev
            - _extract(d.posterior_mean_coef2 / d.posterior_mean_coef1, t, x_t.ndim) * x_t)


def predict_eps_from_xstart(d: GaussianDiffusion, x_t, t, pred_xstart):
    return ((_extract(d.sqrt_recip_alphas_cumprod, t, x_t.ndim) * x_t - pred_xstart)
            / _extract(d.sqrt_recipm1_alphas_cumprod, t, x_t.ndim))


def p_mean_variance(
    d: GaussianDiffusion,
    model_output: jnp.ndarray,
    x: jnp.ndarray,
    t: jnp.ndarray,
    clip_denoised: bool = False,
    denoised_fn: Optional[Callable] = None,
    outpainting_mask: Optional[jnp.ndarray] = None,
    outpainting_gt: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """p(x_{t-1} | x_t) stats + pred_xstart from a precomputed model output.

    Unlike the reference (:458-570) the model call happens outside — this keeps
    the function pure and lets the CFG-doubled denoiser batch live in the model.
    The RePaint-in-DDIM x0 overwrite (:492-501) is applied when an outpainting
    mask is given (START_X prediction only, as the reference asserts).
    """
    if outpainting_mask is not None and d.model_mean_type == "start_x":
        model_output = jnp.where(outpainting_mask, outpainting_gt, model_output)

    if d.model_var_type in ("learned", "learned_range"):
        C = x.shape[1]
        model_output, model_var_values = jnp.split(model_output, [C], axis=1)
        if d.model_var_type == "learned":
            model_log_variance = model_var_values
            model_variance = jnp.exp(model_log_variance)
        else:
            min_log = _extract(d.posterior_log_variance_clipped, t, x.ndim)
            max_log = _extract(d.log_betas, t, x.ndim)
            frac = (model_var_values + 1) / 2
            model_log_variance = frac * max_log + (1 - frac) * min_log
            model_variance = jnp.exp(model_log_variance)
    elif d.model_var_type == "fixed_large":
        model_variance = _extract(d.fixed_large_variance, t, x.ndim) * jnp.ones_like(x)
        model_log_variance = _extract(d.fixed_large_log_variance, t, x.ndim) * jnp.ones_like(x)
    elif d.model_var_type == "fixed_small":
        model_variance = _extract(d.posterior_variance, t, x.ndim) * jnp.ones_like(x)
        model_log_variance = _extract(d.posterior_log_variance_clipped, t, x.ndim) * jnp.ones_like(x)
    else:
        raise NotImplementedError(d.model_var_type)

    def process_xstart(v):
        if denoised_fn is not None:
            v = denoised_fn(v)
        if clip_denoised:
            v = jnp.clip(v, -1.0, 1.0)
        return v

    if d.model_mean_type == "previous_x":
        pred_xstart = process_xstart(predict_xstart_from_xprev(d, x, t, model_output))
        model_mean = model_output
    elif d.model_mean_type in ("start_x", "epsilon"):
        if d.model_mean_type == "start_x":
            pred_xstart = process_xstart(model_output)
        else:
            pred_xstart = process_xstart(predict_xstart_from_eps(d, x, t, model_output))
        model_mean, _, _ = q_posterior_mean_variance(d, pred_xstart, x, t)
    else:
        raise NotImplementedError(d.model_mean_type)

    return {
        "mean": model_mean,
        "variance": model_variance,
        "log_variance": model_log_variance,
        "pred_xstart": pred_xstart,
    }


def training_losses(
    d: GaussianDiffusion,
    model_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """MSE-type training targets (:1158-1245).

    Returns pred/target so the architecture applies its masked, weighted
    reduction (the reference returns the same and reduces in MotionDiffusion).
    """
    x_t = q_sample(d, x_start, t, noise)
    model_output = model_fn(x_t, model_timesteps(d, t))
    target = {
        "previous_x": lambda: q_posterior_mean_variance(d, x_start, x_t, t)[0],
        "start_x": lambda: x_start,
        "epsilon": lambda: noise,
    }[d.model_mean_type]()
    mse = jnp.mean((target - model_output) ** 2, axis=tuple(range(1, x_start.ndim)))
    return {"mse": mse, "target": target, "pred": model_output, "x_t": x_t}


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two gaussians in nats (:172-193)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    return 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Discretized gaussian NLL for VLB terms (:205-232)."""
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    cdf_plus = approx_standard_normal_cdf(inv_stdv * (centered_x + 1.0 / 255.0))
    cdf_min = approx_standard_normal_cdf(inv_stdv * (centered_x - 1.0 / 255.0))
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    log_cdf_delta = jnp.log(jnp.clip(cdf_plus - cdf_min, min=1e-12))
    return jnp.where(x < -0.999, log_cdf_plus,
                     jnp.where(x > 0.999, log_one_minus_cdf_min, log_cdf_delta))


def vb_terms_bpd(d: GaussianDiffusion, model_fn: Callable, x_start, x_t, t,
                 clip_denoised: bool = False):
    """Variational lower-bound term at one timestep, in bits
    (gaussian_diffusion.py:1120-1156)."""
    true_mean, _, true_log_var = q_posterior_mean_variance(d, x_start, x_t, t)
    out = p_mean_variance(d, model_fn(x_t, model_timesteps(d, t)), x_t, t,
                          clip_denoised=clip_denoised)
    kl = normal_kl(true_mean, true_log_var, out["mean"], out["log_variance"])
    kl = kl.mean(axis=tuple(range(1, kl.ndim))) / np.log(2.0)
    decoder_nll = -discretized_gaussian_log_likelihood(
        x_start, means=out["mean"], log_scales=0.5 * out["log_variance"])
    decoder_nll = decoder_nll.mean(axis=tuple(range(1, decoder_nll.ndim))) / np.log(2.0)
    output = jnp.where(t == 0, decoder_nll, kl)
    return {"output": output, "pred_xstart": out["pred_xstart"]}


def prior_bpd(d: GaussianDiffusion, x_start):
    """Prior KL term in bits-per-dim (gaussian_diffusion.py:1247-1265)."""
    B = x_start.shape[0]
    t = jnp.full((B,), d.num_timesteps - 1, jnp.int32)
    qt_mean, _, qt_log_var = q_mean_variance(d, x_start, t)
    kl = normal_kl(qt_mean, qt_log_var, 0.0, 0.0)
    return kl.mean(axis=tuple(range(1, kl.ndim))) / np.log(2.0)


def calc_bpd_loop(d: GaussianDiffusion, model_fn: Callable, x_start,
                  rng, clip_denoised: bool = False) -> Dict[str, jnp.ndarray]:
    """Full VLB in bits-per-dim as one scan over timesteps
    (gaussian_diffusion.py:1267-1327)."""
    B = x_start.shape[0]
    ts = jnp.arange(d.num_timesteps - 1, -1, -1)

    def body(key, t_scalar):
        key, sub = jax.random.split(key)
        t = jnp.full((B,), t_scalar, jnp.int32)
        noise = jax.random.normal(sub, x_start.shape, x_start.dtype)
        x_t = q_sample(d, x_start, t, noise)
        out = vb_terms_bpd(d, model_fn, x_start, x_t, t, clip_denoised)
        eps = predict_eps_from_xstart(d, x_t, t, out["pred_xstart"])
        xstart_mse = ((out["pred_xstart"] - x_start) ** 2).mean(
            axis=tuple(range(1, x_start.ndim)))
        mse = ((eps - noise) ** 2).mean(axis=tuple(range(1, x_start.ndim)))
        return key, (out["output"], xstart_mse, mse)

    _, (vb, xstart_mse, mse) = jax.lax.scan(body, rng, ts)
    vb, xstart_mse, mse = vb.T, xstart_mse.T, mse.T  # [B, T]
    total_bpd = vb.sum(axis=1) + prior_bpd(d, x_start)
    return {"total_bpd": total_bpd, "prior_bpd": prior_bpd(d, x_start),
            "vb": vb, "xstart_mse": xstart_mse, "mse": mse}
