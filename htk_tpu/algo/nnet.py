"""ANN training: frame cross-entropy SGD with HTK's schedulers.

Mirrors `HTKTools/HNTrainSGD.c` + `HTKLib/HNCache.c`: frame-level
cross-entropy training of a feed-forward net on tied-state targets from
forced alignment, with minibatching, frame-level shuffling (FRAMERAND),
momentum SGD, and the NewBob / exponential-decay learning-rate schedules.

The whole update step is one jitted function (forward + backward + SGD);
XLA puts the matmuls on the MXU — the reference needed hand-written CUDA
(HCUDA.cu) for exactly this, which is free here (SURVEY.md §2.5).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.ann import ANNDef, ann_params, forward, splice
from ..utils.errors import HError, HRError


@dataclass
class SGDConfig:
    lr: float = 0.002  # LEARNRATE
    momentum: float = 0.5  # MOMENTUM
    batch_size: int = 256  # MINIBATCHSIZE
    n_epochs: int = 10  # MAXEPOCHNUM
    scheduler: str = "NEWBOB"  # LRSCHEDULER: NEWBOB | EXPDECAY | LIST | FIXED
    newbob_ramp: float = 0.005  # improvement threshold to start decay
    newbob_stop: float = 0.0001  # improvement threshold to stop
    decay_factor: float = 0.5
    lr_list: Optional[List[float]] = None
    frame_rand: bool = True  # FRAMERAND
    seed: int = 0


def make_cache(
    utt_feats: List[np.ndarray], utt_targets: List[np.ndarray], context: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Splice + concatenate all utterances into one frame-level dataset.

    The HNCache role: targets are per-frame tied-state ids from forced
    alignment.
    """
    xs, ys = [], []
    for f, t in zip(utt_feats, utt_targets):
        if f.shape[0] != t.shape[0]:
            HError(7730, "make_cache: feature/target length mismatch")
        xs.append(np.asarray(splice(jnp.asarray(f, jnp.float32), context)))
        ys.append(t.astype(np.int32))
    return np.concatenate(xs), np.concatenate(ys)


@functools.partial(jax.jit, static_argnames=("acts", "lr", "momentum"))
def _sgd_step(params, vel, x, y, acts, lr, momentum):
    def loss_fn(p):
        logits = forward(p, list(acts), x, return_logits=True)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, y[:, None], axis=1).mean()
        acc = jnp.mean((jnp.argmax(logits, axis=1) == y).astype(jnp.float32))
        return ce, acc

    (ce, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    new_vel = jax.tree.map(lambda v, g: momentum * v - lr * g, vel, grads)
    new_params = jax.tree.map(lambda p, v: p + v, params, new_vel)
    return new_params, new_vel, ce, acc


@functools.partial(jax.jit, static_argnames=("acts",))
def _eval_step(params, x, y, acts):
    logits = forward(params, list(acts), x, return_logits=True)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, y[:, None], axis=1).sum()
    acc = jnp.sum((jnp.argmax(logits, axis=1) == y).astype(jnp.float32))
    return ce, acc


def train_ann(
    ann: ANNDef,
    x: np.ndarray,
    y: np.ndarray,
    cfg: SGDConfig,
    holdout: float = 0.1,
    trace: int = 0,
) -> ANNDef:
    """Train in place; returns the ANN with updated weights + priors."""
    n = x.shape[0]
    rng = np.random.default_rng(cfg.seed)
    perm = rng.permutation(n)
    n_cv = max(1, int(n * holdout))
    cv_idx, tr_idx = perm[:n_cv], perm[n_cv:]
    xtr, ytr = x[tr_idx], y[tr_idx]
    xcv, ycv = jnp.asarray(x[cv_idx]), jnp.asarray(y[cv_idx])

    acts = tuple(l.activation for l in ann.layers)
    params = ann_params(ann)
    vel = jax.tree.map(jnp.zeros_like, params)

    def cv_loss(p):
        ce, acc = _eval_step(p, xcv, ycv, acts)
        return float(ce) / n_cv, float(acc) / n_cv

    lr = cfg.lr
    prev_cv = None
    ramping = False
    bs = cfg.batch_size
    for epoch in range(cfg.n_epochs):
        if cfg.scheduler == "LIST" and cfg.lr_list:
            lr = cfg.lr_list[min(epoch, len(cfg.lr_list) - 1)]
        elif cfg.scheduler == "EXPDECAY":
            lr = cfg.lr * (cfg.decay_factor ** epoch)
        order = rng.permutation(len(xtr)) if cfg.frame_rand else np.arange(len(xtr))
        tot_ce = 0.0
        tot_acc = 0.0
        nb = 0
        for i in range(0, len(order) - bs + 1, bs):
            idx = order[i : i + bs]
            params, vel, ce, acc = _sgd_step(
                params, vel, jnp.asarray(xtr[idx]), jnp.asarray(ytr[idx]),
                acts, lr, cfg.momentum,
            )
            tot_ce += float(ce)
            tot_acc += float(acc)
            nb += 1
        cv_ce, cv_acc = cv_loss(params)
        if trace:
            print(
                f"  epoch {epoch + 1}: lr={lr:.5f} train CE={tot_ce / max(nb,1):.4f} "
                f"acc={tot_acc / max(nb,1):.3f} | cv CE={cv_ce:.4f} acc={cv_acc:.3f}"
            )
        if cfg.scheduler == "NEWBOB" and prev_cv is not None:
            improvement = prev_cv - cv_ce
            if ramping and improvement < cfg.newbob_stop:
                break
            if improvement < cfg.newbob_ramp:
                ramping = True
            if ramping:
                lr *= cfg.decay_factor
        prev_cv = cv_ce

    # write back + priors from target frequencies
    for l, (W, b) in zip(ann.layers, params):
        l.weight = np.asarray(W)
        l.bias = np.asarray(b)
    K = ann.out_dim
    counts = np.bincount(y, minlength=K).astype(np.float64) + 1.0
    ann.target_priors = (counts / counts.sum()).astype(np.float32)
    return ann


def hybrid_outp(ann: ANNDef, feats: np.ndarray, prior_scale: float = 1.0):
    """(T, D) -> (T, K) hybrid scores: log P(s|x) - scale*log P(s).

    The hybrid-decoding observation model (HNForward / hybrid HVite):
    scaled posteriors replace GMM b_j(o_t).
    """
    x = splice(jnp.asarray(feats, jnp.float32), ann.context)
    acts = tuple(l.activation for l in ann.layers)
    logits = forward(ann_params(ann), list(acts), x, return_logits=True)
    logpost = jax.nn.log_softmax(logits, axis=-1)
    if ann.target_priors is not None:
        logpost = logpost - prior_scale * jnp.log(
            jnp.asarray(ann.target_priors)[None, :]
        )
    return logpost
