import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tacorl_tpu.core.distributions import (
    DiagNormal,
    TanhNormal,
    balanced_kl,
    gumbel_softmax_log_prob,
    gumbel_softmax_rsample,
    gumbel_softmax_sample,
    kl_diag_normal,
    logistic_mixture_log_prob,
    logistic_mixture_sample,
)

torch = pytest.importorskip("torch")


def test_diag_normal_log_prob_matches_torch(rng):
    mean = jax.random.normal(rng, (4, 6))
    std = jnp.exp(jax.random.normal(jax.random.fold_in(rng, 1), (4, 6)) * 0.3)
    x = jax.random.normal(jax.random.fold_in(rng, 2), (4, 6))
    lp = DiagNormal(mean, std).log_prob(x)
    t = torch.distributions.Independent(
        torch.distributions.Normal(
            torch.tensor(np.asarray(mean)), torch.tensor(np.asarray(std))
        ),
        1,
    ).log_prob(torch.tensor(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(lp), t.numpy(), rtol=1e-4)


def test_kl_diag_normal_matches_torch(rng):
    k = jax.random.split(rng, 4)
    m1, m2 = jax.random.normal(k[0], (5, 3)), jax.random.normal(k[1], (5, 3))
    s1 = jnp.exp(0.2 * jax.random.normal(k[2], (5, 3)))
    s2 = jnp.exp(0.2 * jax.random.normal(k[3], (5, 3)))
    kl = kl_diag_normal(DiagNormal(m1, s1), DiagNormal(m2, s2))

    def t_dist(m, s):
        return torch.distributions.Independent(
            torch.distributions.Normal(
                torch.tensor(np.asarray(m)), torch.tensor(np.asarray(s))
            ),
            1,
        )

    t_kl = torch.distributions.kl_divergence(t_dist(m1, s1), t_dist(m2, s2))
    np.testing.assert_allclose(np.asarray(kl), t_kl.numpy(), rtol=1e-4)


def test_balanced_kl_value_and_gradient_split(rng):
    m1 = jax.random.normal(rng, (8, 4))
    post = DiagNormal(m1, jnp.ones((8, 4)) * 0.5)
    prior = DiagNormal(jnp.zeros((8, 4)), jnp.ones((8, 4)))
    # value equals plain KL regardless of balancing
    np.testing.assert_allclose(
        np.asarray(balanced_kl(post, prior, alpha=0.8)),
        np.asarray(kl_diag_normal(post, prior)),
        rtol=1e-6,
    )

    # gradient flowing to the posterior mean must be scaled by (1 - alpha)
    def loss_balanced(m):
        return balanced_kl(DiagNormal(m, post.std), prior, alpha=0.8).mean()

    def loss_plain(m):
        return kl_diag_normal(DiagNormal(m, post.std), prior).mean()

    g_b = jax.grad(loss_balanced)(m1)
    g_p = jax.grad(loss_plain)(m1)
    np.testing.assert_allclose(np.asarray(g_b), 0.2 * np.asarray(g_p), rtol=1e-5)


def test_tanh_normal_log_prob_matches_change_of_variables(rng):
    mean = jax.random.normal(rng, (7, 3)) * 0.5
    std = jnp.ones((7, 3)) * 0.7
    dist = TanhNormal(mean, std)
    value, z = dist.sample_with_pretanh(jax.random.fold_in(rng, 1))
    lp = dist.log_prob(value, z)
    assert lp.shape == (7, 1)
    # independent computation: N.log_prob(z) - sum log(1 - tanh(z)^2)
    base = DiagNormal(mean, std).log_prob(z)
    jac = jnp.sum(jnp.log1p(-jnp.square(jnp.tanh(z)) + 1e-12), axis=-1)
    np.testing.assert_allclose(
        np.asarray(lp[..., 0]), np.asarray(base - jac), rtol=1e-3, atol=1e-3
    )


def test_tanh_normal_log_prob_without_pretanh(rng):
    dist = TanhNormal(jnp.zeros((4, 2)), jnp.ones((4, 2)))
    value = jnp.tanh(jax.random.normal(rng, (4, 2)))
    lp1 = dist.log_prob(value)
    lp2 = dist.log_prob(value, jnp.arctanh(jnp.clip(value, -0.999, 0.999)))
    np.testing.assert_allclose(np.asarray(lp1), np.asarray(lp2), rtol=1e-3, atol=1e-4)


def test_tanh_normal_samples_bounded_and_centered(rng):
    dist = TanhNormal(jnp.zeros((10000, 1)), jnp.ones((10000, 1)))
    s = dist.sample(rng)
    assert jnp.all(jnp.abs(s) <= 1.0)
    assert abs(float(s.mean())) < 0.05


def test_tanh_normal_sample_n_shapes(rng):
    dist = TanhNormal(jnp.zeros((5, 3)), jnp.ones((5, 3)))
    a, lp = dist.sample_n_with_log_prob(rng, 4)
    assert a.shape == (4, 5, 3) and lp.shape == (4, 5, 1)


def test_gumbel_softmax_log_prob_matches_log_softmax():
    logits = jnp.array([[1.0, 2.0, 0.5]])
    onehot = jnp.array([[0.0, 1.0, 0.0]])
    lp = gumbel_softmax_log_prob(logits, onehot)
    expected = jax.nn.log_softmax(logits)[0, 1]
    np.testing.assert_allclose(float(lp[0, 0]), float(expected), rtol=1e-6)
    # integer-class input path
    lp_int = gumbel_softmax_log_prob(logits, jnp.array([1]))
    np.testing.assert_allclose(float(lp_int[0, 0]), float(expected), rtol=1e-6)


def test_gumbel_softmax_sampling_statistics(rng):
    logits = jnp.log(jnp.array([0.7, 0.2, 0.1]))
    keys = jax.random.split(rng, 4000)
    samples = jax.vmap(lambda k: gumbel_softmax_sample(k, logits))(keys)
    freq = np.bincount(np.asarray(samples), minlength=3) / 4000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.04)


def test_gumbel_softmax_rsample_hard_is_onehot_and_differentiable(rng):
    logits = jnp.array([0.3, -0.2, 1.0])
    y = gumbel_softmax_rsample(rng, logits, hard=True)
    assert set(np.asarray(y).tolist()) <= {0.0, 1.0}
    g = jax.grad(
        lambda lg: gumbel_softmax_rsample(rng, lg, hard=True).sum()
    )(logits)
    assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# discretized logistic mixture
# ---------------------------------------------------------------------------


def _logistic_cdf(x, mean, scale):
    return 1.0 / (1.0 + np.exp(-(x - mean) / scale))


def test_logistic_mixture_interior_matches_bin_mass(rng):
    """In the interior branch the log-prob must equal the true probability
    mass of a bin of half-width act_range/(num_classes-1) around the action
    — an independent check against the analytic logistic CDF."""
    A, K, num_classes = 3, 4, 10
    k = jax.random.split(rng, 3)
    logit_probs = jax.random.normal(k[0], (2, A, K))
    means = 0.2 * jax.random.normal(k[1], (2, A, K))
    log_scales = -1.0 + 0.2 * jax.random.normal(k[2], (2, A, K))
    actions = jnp.zeros((2, A)) + 0.1
    lo, hi = -jnp.ones(A), jnp.ones(A)
    lp = logistic_mixture_log_prob(
        actions, logit_probs, means, log_scales, lo[:, None], hi[:, None], num_classes
    )
    # numpy independent computation
    half_bin = 1.0 / (num_classes - 1)
    w = jax.nn.softmax(logit_probs, axis=-1)
    mass = np.sum(
        np.asarray(w)
        * (
            _logistic_cdf(0.1 + half_bin, np.asarray(means), np.exp(np.asarray(log_scales)))
            - _logistic_cdf(0.1 - half_bin, np.asarray(means), np.exp(np.asarray(log_scales)))
        ),
        axis=-1,
    )
    np.testing.assert_allclose(np.asarray(lp), np.log(mass), rtol=1e-4)


def test_logistic_mixture_edges_use_open_tails():
    A, K = 1, 2
    logit_probs = jnp.zeros((1, A, K))
    means = jnp.zeros((1, A, K))
    log_scales = jnp.full((1, A, K), -1.0)
    lo, hi = -jnp.ones((A, 1)), jnp.ones((A, 1))
    lp_low = logistic_mixture_log_prob(
        jnp.full((1, A), -1.0), logit_probs, means, log_scales, lo, hi
    )
    # low edge: full mass below (-1 + half_bin): CDF(-1 + 1/9)
    scale = math.exp(-1.0)
    expected = math.log(_logistic_cdf(-1.0 + 1.0 / 9.0, 0.0, scale))
    np.testing.assert_allclose(float(lp_low[0, 0]), expected, rtol=1e-5)
    lp_high = logistic_mixture_log_prob(
        jnp.full((1, A), 1.0), logit_probs, means, log_scales, lo, hi
    )
    expected_hi = math.log(1.0 - _logistic_cdf(1.0 - 1.0 / 9.0, 0.0, scale))
    np.testing.assert_allclose(float(lp_high[0, 0]), expected_hi, rtol=1e-5)


def test_logistic_mixture_sample_statistics(rng):
    # single sharp component at 0.5 -> samples concentrate near 0.5
    K = 5
    logit_probs = jnp.array([[-1e9, -1e9, 1e9, -1e9, -1e9]])[None]  # (1,1,K)
    means = jnp.array([[0.0, 0.0, 0.5, 0.0, 0.0]])[None]
    log_scales = jnp.full((1, 1, K), -4.0)
    keys = jax.random.split(rng, 2000)
    samples = jax.vmap(
        lambda k: logistic_mixture_sample(k, logit_probs, means, log_scales)
    )(keys)
    assert abs(float(samples.mean()) - 0.5) < 0.01
    assert float(samples.std()) < 0.1


def test_logistic_mixture_grad_finite(rng):
    A, K = 2, 3
    params = jax.random.normal(rng, (3, 1, A, K))

    def loss(p):
        lp = logistic_mixture_log_prob(
            jnp.full((1, A), 0.3),
            p[0],
            p[1],
            p[2],
            -jnp.ones((A, 1)),
            jnp.ones((A, 1)),
        )
        return -lp.sum()

    g = jax.grad(loss)(params)
    assert np.all(np.isfinite(np.asarray(g)))
