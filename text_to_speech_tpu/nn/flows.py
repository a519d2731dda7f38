"""Normalizing-flow primitives: piecewise rational-quadratic splines.

Monotonic spline bijectors (Durkan et al., "Neural Spline Flows", 2019 —
public math), the transform inside VITS's stochastic duration predictor.
Pure jnp, fully vectorized (no data-dependent control flow: the bin lookup
is a one-hot sum, so the same program serves forward and inverse under
jit/vmap on TPU).

Inputs are UNCONSTRAINED network outputs; this module applies the
published constraints (softmax bin widths/heights, softplus knot
derivatives) and linear tails outside ``[-tail_bound, tail_bound]``.
"""

import jax
import jax.numpy as jnp

DEFAULT_MIN_BIN_WIDTH = 1e-3
DEFAULT_MIN_BIN_HEIGHT = 1e-3
DEFAULT_MIN_DERIVATIVE = 1e-3


def rational_quadratic_spline(x,
                              unnormalized_widths,
                              unnormalized_heights,
                              unnormalized_derivatives,
                              *,
                              inverse = False,
                              tail_bound = 5.0,
                              min_bin_width = DEFAULT_MIN_BIN_WIDTH,
                              min_bin_height = DEFAULT_MIN_BIN_HEIGHT,
                              min_derivative = DEFAULT_MIN_DERIVATIVE):
    """Monotonic piecewise rational-quadratic transform with linear tails.

    x (...,); unnormalized_widths/heights (..., K); unnormalized_derivatives
    (..., K-1) — interior knots; boundary derivatives are fixed so the
    spline meets the identity tails with matching slope.  Returns
    (y, log|dy/dx|) of x's shape.
    """
    x = x.astype(jnp.float32)
    K = unnormalized_widths.shape[-1]

    widths = jax.nn.softmax(unnormalized_widths.astype(jnp.float32), axis = -1)
    widths = min_bin_width + (1 - min_bin_width * K) * widths
    heights = jax.nn.softmax(unnormalized_heights.astype(jnp.float32), axis = -1)
    heights = min_bin_height + (1 - min_bin_height * K) * heights

    # knot positions in [-B, B]
    B = tail_bound
    cumwidths = jnp.cumsum(widths, axis = -1)
    cumwidths = jnp.concatenate(
        [jnp.zeros_like(cumwidths[..., :1]), cumwidths], axis = -1)
    cumwidths = 2 * B * cumwidths - B
    cumheights = jnp.cumsum(heights, axis = -1)
    cumheights = jnp.concatenate(
        [jnp.zeros_like(cumheights[..., :1]), cumheights], axis = -1)
    cumheights = 2 * B * cumheights - B
    widths = cumwidths[..., 1:] - cumwidths[..., :-1]
    heights = cumheights[..., 1:] - cumheights[..., :-1]

    # the boundary-matching constant: softplus(c) = 1 - min_derivative
    boundary = jnp.log(jnp.expm1(1. - min_derivative))
    derivs = jnp.concatenate([
        jnp.full_like(unnormalized_derivatives[..., :1], boundary),
        unnormalized_derivatives.astype(jnp.float32),
        jnp.full_like(unnormalized_derivatives[..., :1], boundary),
    ], axis = -1)
    derivs = min_derivative + jax.nn.softplus(derivs)          # (..., K+1)

    inside = (x >= -B) & (x <= B)
    x_in = jnp.clip(x, -B, B)

    # bin index by one-hot comparison (static shapes, no searchsorted)
    grid = cumheights if inverse else cumwidths
    idx = jnp.sum((x_in[..., None] >= grid[..., 1:-1]).astype(jnp.int32),
                  axis = -1)                                   # (...,) in [0, K)
    take = lambda t: jnp.take_along_axis(t, idx[..., None], axis = -1)[..., 0]

    x_k = take(cumwidths)
    w_k = take(widths)
    y_k = take(cumheights)
    h_k = take(heights)
    d_k = take(derivs[..., :-1])
    d_k1 = take(derivs[..., 1:])
    s_k = h_k / w_k

    if not inverse:
        theta = (x_in - x_k) / w_k
        theta_1m = theta * (1 - theta)
        numerator = h_k * (s_k * theta ** 2 + d_k * theta_1m)
        denominator = s_k + (d_k1 + d_k - 2 * s_k) * theta_1m
        y = y_k + numerator / denominator
        d_num = s_k ** 2 * (d_k1 * theta ** 2 + 2 * s_k * theta_1m
                            + d_k * (1 - theta) ** 2)
        logabsdet = jnp.log(d_num) - 2 * jnp.log(denominator)
    else:
        # solve the quadratic for theta
        t = x_in - y_k
        a = h_k * (s_k - d_k) + t * (d_k1 + d_k - 2 * s_k)
        b = h_k * d_k - t * (d_k1 + d_k - 2 * s_k)
        c = -s_k * t
        disc = b ** 2 - 4 * a * c
        disc = jnp.maximum(disc, 0.)
        theta = 2 * c / (-b - jnp.sqrt(disc))
        theta = jnp.clip(theta, 0., 1.)
        y = theta * w_k + x_k
        theta_1m = theta * (1 - theta)
        denominator = s_k + (d_k1 + d_k - 2 * s_k) * theta_1m
        d_num = s_k ** 2 * (d_k1 * theta ** 2 + 2 * s_k * theta_1m
                            + d_k * (1 - theta) ** 2)
        logabsdet = -(jnp.log(d_num) - 2 * jnp.log(denominator))

    y = jnp.where(inside, y, x)
    logabsdet = jnp.where(inside, logabsdet, 0.)
    return y, logabsdet
