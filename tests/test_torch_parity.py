"""Numerical parity vs the reference's PyTorch math.

The reference itself cannot run here (its kernels live in tiny-cuda-nn /
nerfacc CUDA extensions), so these tests re-state its exact formulas in
PyTorch (cited per test) on analytic fields and check that our packed TPU
pipeline reproduces values AND input gradients allclose — the
renders/pixel-gradients parity contract from BASELINE.json.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch

from instant_nsr_pl_tpu.ops.marching import march_rays, packed_positions
from instant_nsr_pl_tpu.ops.ray import ray_aabb_intersect
from instant_nsr_pl_tpu.ops.rendering import (
    accumulate_along_rays,
    distortion_loss,
    render_weight_from_alpha,
    render_weight_from_density,
)


def _rays(n=32, seed=0):
    rng = np.random.RandomState(seed)
    o = np.zeros((n, 3), np.float32)
    o[:, 2] = -3.0
    d = rng.normal(size=(n, 3)).astype(np.float32) * 0.12 + np.array(
        [0, 0, 1], np.float32
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d


def _density_np(pts, theta):
    # analytic gaussian-blob density, differentiable in theta
    r2 = (pts**2).sum(-1)
    return theta * np.exp(-4.0 * r2)


def _color_np(pts):
    return 0.5 + 0.4 * np.sin(3.0 * pts)


def test_volume_rendering_parity_values_and_grads():
    """Our packed compositing == the reference's density->weights->rgb math
    (nerfacc render_weight_from_density + accumulate_along_rays as consumed
    at reference models/nerf.py:105-109), including d(loss)/d(theta)."""
    o, d = _rays()
    n = o.shape[0]
    S = 64
    step = 3.0 * 1.732 / S
    t0, t1 = ray_aabb_intersect(jnp.asarray(o), jnp.asarray(d), -1.5, 1.5)

    samples = march_rays(
        jnp.asarray(o), jnp.asarray(d), t0, t1,
        render_step_size=step, max_samples=S, capacity=n * S,
    )

    def jax_render(theta):
        pos, dirs, t_mid, dists = packed_positions(
            samples, jnp.asarray(o), jnp.asarray(d)
        )
        sigma = theta * jnp.exp(-4.0 * (pos**2).sum(-1))
        rgb = 0.5 + 0.4 * jnp.sin(3.0 * pos)
        w = render_weight_from_density(
            samples.t_starts, samples.t_ends, sigma,
            samples.ray_indices, samples.valid,
        )
        comp = accumulate_along_rays(
            w, samples.ray_indices, rgb, n_rays=n, valid=samples.valid
        )
        op = accumulate_along_rays(
            w, samples.ray_indices, None, n_rays=n, valid=samples.valid
        )
        comp = comp + (1.0 - op)  # white background (reference nerf.py:109)
        return comp, op

    theta0 = 25.0
    comp_j, op_j = jax_render(jnp.float32(theta0))
    gtheta_j = jax.grad(
        lambda th: (jax_render(th)[0] ** 2).sum()
    )(jnp.float32(theta0))

    # torch dense reference: same t grid, exclusive-cumprod transmittance
    theta_t = torch.tensor(theta0, dtype=torch.float64, requires_grad=True)
    t0n, t1n = np.asarray(t0), np.asarray(t1)
    i = np.arange(S)
    ts = t0n[:, None] + i[None, :] * step  # t_starts
    te = ts + step
    tm = 0.5 * (ts + te)
    valid = torch.from_numpy((tm < t1n[:, None]))
    pos = torch.from_numpy(o[:, None, :] + d[:, None, :] * tm[..., None])
    sigma = theta_t * torch.exp(-4.0 * (pos**2).sum(-1)) * valid
    rgb = 0.5 + 0.4 * torch.sin(3.0 * pos)
    alpha = 1.0 - torch.exp(-sigma * step)
    one_m = torch.cat([torch.ones_like(alpha[:, :1]), 1.0 - alpha[:, :-1]], 1)
    trans = torch.cumprod(one_m, dim=1)
    w = alpha * trans
    comp_t = (w[..., None] * rgb).sum(1) + (1.0 - w.sum(1, keepdim=True))
    (comp_t**2).sum().backward()

    np.testing.assert_allclose(
        np.asarray(comp_j), comp_t.detach().numpy(), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        float(gtheta_j), float(theta_t.grad), rtol=2e-4
    )


def test_neus_alpha_parity():
    """Our get_alpha == the reference's cos-annealed section-integral formula
    (reference models/neus.py:117-139), restated in torch."""
    from instant_nsr_pl_tpu.config import config_from_dict
    from instant_nsr_pl_tpu.models.neus import NeuSModel

    rng = np.random.RandomState(0)
    n = 257
    sdf = rng.normal(size=n).astype(np.float32) * 0.1
    normal = rng.normal(size=(n, 3)).astype(np.float32)
    normal /= np.linalg.norm(normal, axis=1, keepdims=True)
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    dists = np.full(n, 0.01, np.float32)
    inv_s = 64.0

    for ratio in (0.0, 0.37, 1.0):
        ours = NeuSModel.get_alpha(
            None, jnp.float32(inv_s), jnp.float32(ratio),
            jnp.asarray(sdf), jnp.asarray(normal), jnp.asarray(dirs),
            jnp.asarray(dists),
        )

        # torch restatement of models/neus.py:117-139
        sdf_t = torch.from_numpy(sdf)
        true_cos = (torch.from_numpy(dirs) * torch.from_numpy(normal)).sum(-1)
        iter_cos = -(
            torch.relu(-true_cos * 0.5 + 0.5) * (1.0 - ratio)
            + torch.relu(-true_cos) * ratio
        )
        d_t = torch.from_numpy(dists)
        est_next = sdf_t + iter_cos * d_t * 0.5
        est_prev = sdf_t - iter_cos * d_t * 0.5
        prev_cdf = torch.sigmoid(est_prev * inv_s)
        next_cdf = torch.sigmoid(est_next * inv_s)
        alpha_t = ((prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)).clip(0, 1)

        np.testing.assert_allclose(
            np.asarray(ours), alpha_t.numpy(), rtol=1e-5, atol=1e-6
        )


def test_render_weight_from_alpha_parity():
    """Packed alpha compositing == torch cumprod (nerfacc
    render_weight_from_alpha role, reference models/neus.py:237)."""
    rng = np.random.RandomState(1)
    n_rays, S = 8, 16
    alpha = rng.uniform(0, 0.8, size=(n_rays, S)).astype(np.float32)
    ray_idx = np.repeat(np.arange(n_rays), S).astype(np.int32)
    valid = np.ones(n_rays * S, bool)

    ours = render_weight_from_alpha(
        jnp.asarray(alpha.reshape(-1)), jnp.asarray(ray_idx), jnp.asarray(valid)
    )
    a = torch.from_numpy(alpha)
    one_m = torch.cat([torch.ones_like(a[:, :1]), 1 - a[:, :-1]], 1)
    w_t = a * torch.cumprod(one_m, 1)
    np.testing.assert_allclose(
        np.asarray(ours).reshape(n_rays, S), w_t.numpy(), rtol=1e-5, atol=1e-7
    )


def test_distortion_loss_parity():
    """Packed distortion loss == the O(S^2) MipNeRF-360 double sum it
    replaces (torch_efficient_distloss.flatten_eff_distloss role, reference
    systems/nerf.py:104)."""
    rng = np.random.RandomState(2)
    n_rays, S = 6, 24
    w = rng.uniform(0, 0.1, size=(n_rays, S)).astype(np.float32)
    m = np.sort(rng.uniform(0.1, 3.0, size=(n_rays, S)), axis=1).astype(np.float32)
    d = rng.uniform(0.01, 0.05, size=(n_rays, S)).astype(np.float32)
    ray_idx = np.repeat(np.arange(n_rays), S).astype(np.int32)
    valid = np.ones(n_rays * S, bool)

    ours = distortion_loss(
        jnp.asarray(w.reshape(-1)), jnp.asarray(m.reshape(-1)),
        jnp.asarray(d.reshape(-1)), jnp.asarray(ray_idx), jnp.asarray(valid),
        n_rays=n_rays,
    )
    wt = torch.from_numpy(w.astype(np.float64))
    mt = torch.from_numpy(m.astype(np.float64))
    dt = torch.from_numpy(d.astype(np.float64))
    pair = (
        wt[:, :, None] * wt[:, None, :] * (mt[:, :, None] - mt[:, None, :]).abs()
    ).sum((1, 2))
    uni = (wt**2 * dt).sum(1) / 3.0
    expected = (pair + uni).mean()
    np.testing.assert_allclose(float(ours), float(expected), rtol=1e-4)


def test_ssim_matches_torch_reference_formula():
    """Our SSIM vs a torch restatement of the reference's gaussian-window
    SSIM (reference systems/criterions.py:55-152: reflect padding, 11x11
    sigma-1.5 separable gaussian, C1=0.01^2 C2=0.03^2, cross-correlation;
    the symmetric kernel makes conv == cross-correlation)."""
    import torch
    import torch.nn.functional as F

    from instant_nsr_pl_tpu.systems.criterions import ssim

    rng = np.random.RandomState(5)
    a = rng.rand(48, 40, 3).astype(np.float32)
    b = np.clip(a + rng.randn(48, 40, 3).astype(np.float32) * 0.08, 0, 1)

    def torch_ssim(x, y, k=11, sigma=1.5):
        t = torch.linspace(-(k - 1) / 2.0, (k - 1) / 2.0, k, dtype=torch.float64)
        g = torch.exp(-0.5 * (t / sigma) ** 2)
        g = g / g.sum()
        kernel = torch.outer(g, g)[None, None].expand(3, 1, k, k)
        xt = torch.from_numpy(x.astype(np.float64)).permute(2, 0, 1)[None]
        yt = torch.from_numpy(y.astype(np.float64)).permute(2, 0, 1)[None]
        pad = [k // 2] * 4
        xt = F.pad(xt, pad, mode="reflect")
        yt = F.pad(yt, pad, mode="reflect")
        conv = lambda z: F.conv2d(z, kernel, groups=3)  # noqa: E731
        mx, my = conv(xt), conv(yt)
        sxx = conv(xt * xt) - mx * mx
        syy = conv(yt * yt) - my * my
        sxy = conv(xt * yt) - mx * my
        c1, c2 = 0.01**2, 0.03**2
        m = ((2 * mx * my + c1) * (2 * sxy + c2)) / (
            (mx * mx + my * my + c1) * (sxx + syy + c2)
        )
        return float(m.mean())

    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = torch_ssim(a, b)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
