"""JAX regressor zoo: linear / kernel / neighbor reward estimators.

Functional counterparts of the reference's sklearn model zoo
(/root/reference/regression.py:80-217), rebuilt as JAX solvers so inference
(and most training) runs on the accelerator:

  LR   closed-form least squares                       (fit_LR,  :80-83)
  EN   elastic net via FISTA proximal gradient         (fit_EN,  :86-99)
  BR   Bayesian ridge, SVD evidence iteration          (fit_BR,  :102-117)
  SGD  per-sample SGD with inverse-scaling step        (fit_SGD, :120-132)
  SVR  RBF epsilon-SVR, primal Adam on the kernel form (fit_SVR, :135-150)
  LSVR linear epsilon-SVR, primal Adam                 (fit_LSVR,:153-166)
  KNR  k-nearest-neighbours mean, batched distance     (fit_KNR, :205-217)

Hyper-parameter dataclasses keep the reference's field names and defaults.
These are *behavioral* equivalents (same objective, same defaults), not
bitwise sklearn clones; tests/test_estimators.py checks them against sklearn
as an oracle on synthetic data.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .common import SaveOpt, fit_model

_f32 = jnp.float32


# ----------------------------------------------------------------------------
# Linear regression (closed form)
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class LROpt:
    """Options for plain linear regression (none — kept for symmetry)."""


class _LinearModel:
    """Shared predict for models with a {'w', 'b'} state."""

    @staticmethod
    @jax.jit
    def _pred(w, b, x):
        return x @ w + b

    def predict(self, state, x):
        return self._pred(
            jnp.asarray(state["w"], _f32), _f32(state["b"]), jnp.asarray(x, _f32)
        )


class _LR(_LinearModel):
    def fit(self, x, y):
        xj = jnp.asarray(x, _f32)
        yj = jnp.asarray(y, _f32)
        xm, ym = xj.mean(0), yj.mean()
        w, *_ = jnp.linalg.lstsq(xj - xm, yj - ym)
        b = ym - xm @ w
        return {"w": np.asarray(w), "b": float(b)}


def fit_LR(data, save_opts: SaveOpt | None = None):
    """Fit a linear regression model."""
    return fit_model(_LR(), "Linear Regression", data, save_opts)


# ----------------------------------------------------------------------------
# Elastic net (FISTA on the sklearn objective)
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class ENOpt:
    """Options for the Elastic net regression model."""

    alpha: float = 0.01  # Constant that multiplies the penalty terms.
    l1_ratio: float = 0.5  # The ElasticNet mixing parameter.
    max_iter: int = 2000
    tol: float = 1e-7


_ENOPT = ENOpt()


@partial(jax.jit, static_argnames=("max_iter",))
def _en_fista(x, y, alpha, l1_ratio, max_iter):
    """min_w 1/(2n)||y - Xw||^2 + alpha*l1*|w|_1 + alpha*(1-l1)/2*|w|^2."""
    n = x.shape[0]
    l1 = alpha * l1_ratio
    l2 = alpha * (1.0 - l1_ratio)
    # Lipschitz constant of the smooth part: sigma_max(X)^2 / n + l2.
    lip = jnp.linalg.norm(x, ord=2) ** 2 / n + l2
    step = 1.0 / lip

    def smooth_grad(w):
        r = x @ w - y
        return x.T @ r / n + l2 * w

    def body(_, carry):
        w, z, t = carry
        g = smooth_grad(z)
        w_new = z - step * g
        w_new = jnp.sign(w_new) * jnp.maximum(jnp.abs(w_new) - step * l1, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = w_new + (t - 1.0) / t_new * (w_new - w)
        return w_new, z_new, t_new

    w0 = jnp.zeros((x.shape[1],), x.dtype)
    w, _, _ = jax.lax.fori_loop(0, max_iter, body, (w0, w0, jnp.asarray(1.0, x.dtype)))
    return w


class _EN(_LinearModel):
    def __init__(self, opts: ENOpt):
        self.opts = opts

    def fit(self, x, y):
        xj = jnp.asarray(x, _f32)
        yj = jnp.asarray(y, _f32)
        ym = yj.mean()
        xm = xj.mean(0)
        w = _en_fista(
            xj - xm, yj - ym, self.opts.alpha, self.opts.l1_ratio, self.opts.max_iter
        )
        b = ym - xm @ w
        return {"w": np.asarray(w), "b": float(b)}


def fit_EN(data, opts: ENOpt = _ENOPT, save_opts: SaveOpt | None = None):
    """Fit an elastic net model."""
    return fit_model(_EN(opts), "Elastic Net", data, save_opts)


# ----------------------------------------------------------------------------
# Bayesian ridge (evidence maximization on the SVD)
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class BROpt:
    """Options for the Bayesian ridge regression model."""

    alpha_1: float = 1e-6  # Shape parameter for the Gamma prior over alpha.
    alpha_2: float = 1e-6  # Rate parameter for the Gamma prior over alpha.
    lambda_1: float = 1e-6  # Shape parameter for the Gamma prior over lambda.
    lambda_2: float = 1e-6  # Rate parameter for the Gamma prior over lambda.
    n_iter: int = 300
    tol: float = 1e-3


_BROPT = BROpt()


@partial(jax.jit, static_argnames=("n_iter",))
def _br_solve(x, y, a1, a2, l1, l2, n_iter, tol):
    n, f = x.shape
    u, s, vt = jnp.linalg.svd(x, full_matrices=False)
    uty = u.T @ y
    s2 = s * s
    eps = jnp.finfo(x.dtype).eps
    alpha0 = 1.0 / (jnp.var(y) + eps)
    lam0 = jnp.asarray(1.0, x.dtype)

    def coef(alpha, lam):
        d = s / (s2 + lam / alpha)
        w = vt.T @ (d * uty)
        return w

    def body(carry):
        alpha, lam, w_old, i, done = carry
        w = coef(alpha, lam)
        rss = jnp.sum((y - x @ w) ** 2)
        gamma = jnp.sum(alpha * s2 / (lam + alpha * s2))
        lam_n = (gamma + 2.0 * l1) / (jnp.sum(w * w) + 2.0 * l2)
        alpha_n = (n - gamma + 2.0 * a1) / (rss + 2.0 * a2)
        done = jnp.sum(jnp.abs(w - w_old)) < tol
        return alpha_n, lam_n, w, i + 1, done

    def cond(carry):
        _, _, _, i, done = carry
        return (~done) & (i < n_iter)

    w0 = jnp.zeros((f,), x.dtype)
    alpha, lam, w, _, _ = jax.lax.while_loop(
        cond, body, (alpha0, lam0, w0, jnp.asarray(0), jnp.asarray(False))
    )
    return coef(alpha, lam)


class _BR(_LinearModel):
    def __init__(self, opts: BROpt):
        self.opts = opts

    def fit(self, x, y):
        xj = jnp.asarray(x, _f32)
        yj = jnp.asarray(y, _f32)
        xm, ym = xj.mean(0), yj.mean()
        o = self.opts
        w = _br_solve(
            xj - xm, yj - ym, o.alpha_1, o.alpha_2, o.lambda_1, o.lambda_2,
            o.n_iter, o.tol,
        )
        b = ym - xm @ w
        return {"w": np.asarray(w), "b": float(b)}


def fit_BR(data, opts: BROpt = _BROPT, save_opts: SaveOpt | None = None):
    """Fit a Bayesian ridge regression model."""
    return fit_model(_BR(opts), "Bayesian Ridge", data, save_opts)


# ----------------------------------------------------------------------------
# SGD regressor (per-sample SGD, inverse-scaling learning rate)
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class SGDOpt:
    """Options for the Stochastic Gradient Descent regression model."""

    alpha: float = 0.001  # Constant that multiplies the regularization term.
    eta0: float = 0.01
    power_t: float = 0.25
    max_epochs: int = 60
    seed: int = 0


_SGDOPT = SGDOpt()


@partial(jax.jit, static_argnames=("max_epochs",))
def _sgd_fit(x, y, alpha, eta0, power_t, key, max_epochs):
    n, f = x.shape

    def epoch(carry, e):
        w, b, t, key = carry
        key, sub = jax.random.split(key)
        order = jax.random.permutation(sub, n)

        def step(carry, i):
            w, b, t = carry
            xi, yi = x[i], y[i]
            eta = eta0 / (t**power_t)
            err = xi @ w + b - yi
            w = w - eta * (err * xi + alpha * w)
            b = b - eta * err
            return (w, b, t + 1.0), None

        (w, b, t), _ = jax.lax.scan(step, (w, b, t), order)
        return (w, b, t, key), None

    w0 = jnp.zeros((f,), x.dtype)
    (w, b, _, _), _ = jax.lax.scan(
        epoch, (w0, jnp.asarray(0.0, x.dtype), jnp.asarray(1.0, x.dtype), key),
        jnp.arange(max_epochs),
    )
    return w, b


class _SGD(_LinearModel):
    def __init__(self, opts: SGDOpt):
        self.opts = opts

    def fit(self, x, y):
        o = self.opts
        w, b = _sgd_fit(
            jnp.asarray(x, _f32), jnp.asarray(y, _f32), o.alpha, o.eta0,
            o.power_t, jax.random.PRNGKey(o.seed), o.max_epochs,
        )
        return {"w": np.asarray(w), "b": float(b)}


def fit_SGD(data, opts: SGDOpt = _SGDOPT, save_opts: SaveOpt | None = None):
    """Fit a Stochastic Gradient Descent regressor."""
    return fit_model(_SGD(opts), "Stochastic Gradient Descent Regressor", data, save_opts)


# ----------------------------------------------------------------------------
# Epsilon-SVR: RBF (kernel primal) and linear, optimized with Adam
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class SVROpt:
    """Options for the support vector regression model."""

    C: float = 0.05  # Regularization parameter.
    epsilon: float = 0.05  # Epsilon in the epsilon-SVR model.
    kernel: str = "rbf"  # 'rbf' or 'linear'.
    max_iter: int = 1000
    lr: float = 0.02


_SVROPT = SVROpt()


@dataclasses.dataclass
class LSVROpt:
    """Options for the linear support vector regression model."""

    C: float = 0.005  # Regularization parameter.
    epsilon: float = 0.005  # Epsilon in the epsilon-SVR model.
    max_iter: int = 1000
    lr: float = 0.02


_LSVROPT = LSVROpt()


def _adam_minimize(loss_fn, params, lr, steps):
    import optax

    opt = optax.adam(lr)
    state = opt.init(params)

    def body(carry, _):
        params, state = carry
        g = jax.grad(loss_fn)(params)
        updates, state = opt.update(g, state)
        return (optax.apply_updates(params, updates), state), None

    (params, _), _ = jax.lax.scan(body, (params, state), None, length=steps)
    return params


@partial(jax.jit, static_argnames=("max_iter",))
def _svr_rbf_fit(k, y, C, epsilon, lr, max_iter):
    n = k.shape[0]

    def loss(p):
        beta, b = p
        f = k @ beta + b
        hinge = jnp.maximum(jnp.abs(y - f) - epsilon, 0.0)
        return 0.5 * beta @ (k @ beta) + C * jnp.sum(hinge)

    p0 = (jnp.zeros((n,), k.dtype), jnp.asarray(0.0, k.dtype))
    beta, b = _adam_minimize(loss, p0, lr, max_iter)
    return beta, b


@partial(jax.jit, static_argnames=("max_iter",))
def _svr_linear_fit(x, y, C, epsilon, lr, max_iter):
    f = x.shape[1]

    def loss(p):
        w, b = p
        r = x @ w + b - y
        hinge = jnp.maximum(jnp.abs(r) - epsilon, 0.0)
        return 0.5 * w @ w + C * jnp.sum(hinge)

    p0 = (jnp.zeros((f,), x.dtype), jnp.asarray(0.0, x.dtype))
    w, b = _adam_minimize(loss, p0, lr, max_iter)
    return w, b


def _rbf_kernel(a, b, gamma):
    sq = (
        jnp.sum(a * a, 1)[:, None]
        + jnp.sum(b * b, 1)[None, :]
        - 2.0 * a @ b.T
    )
    return jnp.exp(-gamma * jnp.maximum(sq, 0.0))


class _SVR:
    def __init__(self, opts: SVROpt):
        self.opts = opts

    def fit(self, x, y):
        o = self.opts
        xj = jnp.asarray(x, _f32)
        yj = jnp.asarray(y, _f32)
        if o.kernel == "linear":
            w, b = _svr_linear_fit(xj, yj, o.C, o.epsilon, o.lr, o.max_iter)
            return {"kernel": "linear", "w": np.asarray(w), "b": float(b)}
        # sklearn's gamma='scale' = 1 / (n_features * X.var())
        gamma = 1.0 / (x.shape[1] * max(float(np.asarray(x).var()), 1e-12))
        k = _rbf_kernel(xj, xj, gamma)
        beta, b = _svr_rbf_fit(k, yj, o.C, o.epsilon, o.lr, o.max_iter)
        return {
            "kernel": "rbf",
            "beta": np.asarray(beta),
            "b": float(b),
            "gamma": gamma,
            "x_train": np.asarray(x, np.float32),
        }

    def predict(self, state, x):
        xj = jnp.asarray(x, _f32)
        if state["kernel"] == "linear":
            return xj @ jnp.asarray(state["w"], _f32) + state["b"]
        k = _rbf_kernel(xj, jnp.asarray(state["x_train"], _f32), state["gamma"])
        return k @ jnp.asarray(state["beta"], _f32) + state["b"]


def fit_SVR(data, opts: SVROpt = _SVROPT, save_opts: SaveOpt | None = None):
    """Fit a support vector regression model."""
    return fit_model(_SVR(opts), "Support Vector Regression", data, save_opts)


class _LSVR(_LinearModel):
    def __init__(self, opts: LSVROpt):
        self.opts = opts

    def fit(self, x, y):
        o = self.opts
        w, b = _svr_linear_fit(
            jnp.asarray(x, _f32), jnp.asarray(y, _f32), o.C, o.epsilon, o.lr,
            o.max_iter,
        )
        return {"w": np.asarray(w), "b": float(b)}


def fit_LSVR(data, opts: LSVROpt = _LSVROPT, save_opts: SaveOpt | None = None):
    """Fit a linear support vector regression model."""
    return fit_model(_LSVR(opts), "Linear Support Vector Regression", data, save_opts)


# ----------------------------------------------------------------------------
# K-nearest-neighbours regressor (batched distance matmul + top-k)
# ----------------------------------------------------------------------------


@dataclasses.dataclass
class KNROpt:
    """Options for the K-nearest Neighbors regression model."""

    n_neighbors: int = 500  # Number of neighbors to use.


_KNROPT = KNROpt()


@partial(jax.jit, static_argnames=("k",))
def _knr_predict(x_train, y_train, x, k):
    sq = (
        jnp.sum(x * x, 1)[:, None]
        + jnp.sum(x_train * x_train, 1)[None, :]
        - 2.0 * x @ x_train.T
    )
    _, idx = jax.lax.top_k(-sq, k)
    return jnp.mean(y_train[idx], axis=1)


class _KNR:
    def __init__(self, opts: KNROpt):
        self.opts = opts

    def fit(self, x, y):
        return {"x": np.asarray(x, np.float32), "y": np.asarray(y, np.float32)}

    def predict(self, state, x):
        k = min(self.opts.n_neighbors, len(state["y"]))
        return _knr_predict(
            jnp.asarray(state["x"], _f32),
            jnp.asarray(state["y"], _f32),
            jnp.asarray(x, _f32),
            k,
        )


def fit_KNR(data, opts: KNROpt = _KNROPT, save_opts: SaveOpt | None = None):
    """Fit a K Neighbors Regressor."""
    return fit_model(_KNR(opts), "K Neighbors Regressor", data, save_opts)
