"""Speaker adaptation: MLLR mean, CMLLR (constrained), MAP.

Mirrors `HTKLib/HAdapt.c` / `HTKLib/HMap.c` (SURVEY.md §2.1):

- **MLLR mean**: mu' = A mu + b = W xi, xi = [1; mu]. W solves row-wise
  W_i = G_i^{-1} k_i with
    G_i = sum_m (gamma_m / sigma^2_mi) xi_m xi_m^T
    k_i = sum_m (sumx_mi / sigma^2_mi) xi_m
  — needs only the per-Gaussian occupancy and first-order accumulators
  that standard Baum-Welch already produces (fb.Accumulators).

- **CMLLR**: feature transform x' = A x + b maximising the constrained
  likelihood; estimated row-by-row with the cofactor iteration
  (HAdapt.c's closed-form row update with the log|A| term). Needs
  second-order data statistics, accumulated on device by cmllr_stats().

- **MAP**: mu_map = (tau*mu0 + sumx) / (tau + occ) (HMap.c), wired into
  reestimation via map_tau.

Transforms store/load as TMF files using HTK's macro syntax (~a blocks);
the body layout follows HTK's MLLRMEAN/CMLLR xform kinds in simplified
form [LC — byte-level parity with HTK TMFs unverified, reference absent].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from ..models.hmmset import CompiledHMMSet
from ..utils.errors import HError
from .fb import Accumulators


def speaker_from_mask(mask: str, name: str) -> str:
    """Extract the speaker id from a filename using an HTK -h mask.

    HTK masks use `%` to capture one speaker-name character and `*` as a
    wildcard, e.g. `*/%%%_*.mfc` captures the first 3 chars of the
    basename. Matching follows HAdapt's MaskMatch semantics; returns the
    captured characters, or the whole basename when the mask doesn't
    match (with a warning at the caller).
    """
    import os as _os

    cand = name
    base = _os.path.basename(name)

    def match(m: str, s: str):
        # returns captured string or None; simple backtracking matcher
        if not m:
            return "" if not s else None
        if m[0] == "*":
            for k in range(len(s) + 1):
                r = match(m[1:], s[k:])
                if r is not None:
                    return r
            return None
        if not s:
            return None
        if m[0] == "%":
            r = match(m[1:], s[1:])
            return None if r is None else s[0] + r
        if m[0] == "?" or m[0] == s[0]:
            r = match(m[1:], s[1:])
            return r
        return None

    for target in (name, base):
        got = match(mask, target)
        if got:
            return got
    return _os.path.splitext(base)[0]


@dataclass
class Transform:
    kind: str  # "MLLRMEAN" | "CMLLR"
    A: np.ndarray  # (D, D)
    b: np.ndarray  # (D,)

    def apply_to_means(self, means: np.ndarray) -> np.ndarray:
        if self.kind != "MLLRMEAN":
            HError(7450, "apply_to_means: transform kind %s", self.kind)
        return means @ self.A.T + self.b[None, :]

    def apply_to_features(self, feats: np.ndarray) -> np.ndarray:
        if self.kind != "CMLLR":
            HError(7450, "apply_to_features: transform kind %s", self.kind)
        return feats @ self.A.T + self.b[None, :]


def estimate_mllr_mean(comp: CompiledHMMSet, accs: Accumulators,
                       min_occ: float = 1e-2) -> Transform:
    """Global MLLR mean transform from standard FB accumulators."""
    occ = np.asarray(accs.occ, np.float64)
    sum_x = np.asarray(accs.sum_x, np.float64)
    mu = comp.means.astype(np.float64)
    var = comp.variances.astype(np.float64)
    M, D = mu.shape
    if occ.sum() < min_occ:
        HError(7440, "estimate_mllr_mean: no adaptation data")

    xi = np.concatenate([np.ones((M, 1)), mu], axis=1)  # (M, D+1)
    W = np.zeros((D, D + 1))
    for i in range(D):
        w_m = occ / var[:, i]  # (M,)
        G = (xi * w_m[:, None]).T @ xi  # (D+1, D+1)
        k = (sum_x[:, i] / var[:, i]) @ xi  # (D+1,)
        G += np.eye(D + 1) * 1e-6  # ridge for unseen dims
        W[i] = np.linalg.solve(G, k)
    return Transform(kind="MLLRMEAN", A=W[:, 1:].copy(), b=W[:, 0].copy())


def build_regression_classes(comp: CompiledHMMSet, n_classes: int) -> np.ndarray:
    """Cluster Gaussians into regression base classes (HAdapt ~b role).

    HTK builds a centroid-split regression tree; the flat equivalent here
    is k-means over the Gaussian means — at estimation time classes with
    too little occupancy fall back to the global transform, which is the
    tree's back-off behaviour for a depth-1 tree. Returns (M,) class ids.
    """
    from .kmeans import kmeans

    if comp.n_mix <= n_classes:
        return np.arange(comp.n_mix, dtype=np.int32) % max(n_classes, 1)
    assign, _means = kmeans(comp.means.astype(np.float64), n_classes)
    return assign.astype(np.int32)


def estimate_mllr_classes(
    comp: CompiledHMMSet,
    accs: Accumulators,
    classes: np.ndarray,
    min_occ: float = 100.0,
):
    """Per-regression-class MLLR mean transforms with global back-off.

    Returns (transforms list, class->transform index (C,)). Classes whose
    occupancy is below min_occ use the global transform (index 0).
    """
    global_xf = estimate_mllr_mean(comp, accs)
    xforms = [global_xf]
    n_classes = int(classes.max()) + 1
    class_to_xf = np.zeros(n_classes, np.int32)
    occ = np.asarray(accs.occ, np.float64)
    for c in range(n_classes):
        sel = classes == c
        if occ[sel].sum() < min_occ:
            continue
        sub = Accumulators(
            occ=np.where(sel, np.asarray(accs.occ), 0.0).astype(np.float32),
            sum_x=np.where(sel[:, None], np.asarray(accs.sum_x), 0.0).astype(
                np.float32),
            sum_xx=np.asarray(accs.sum_xx),
            wt_occ=np.asarray(accs.wt_occ),
            tr=np.asarray(accs.tr),
            total_logp=accs.total_logp, total_frames=accs.total_frames,
            n_utts=accs.n_utts,
        )
        xforms.append(estimate_mllr_mean(comp, sub))
        class_to_xf[c] = len(xforms) - 1
    return xforms, class_to_xf


def apply_mllr_classes(
    comp: CompiledHMMSet, base_means: np.ndarray,
    xforms, class_to_xf: np.ndarray, classes: np.ndarray,
) -> np.ndarray:
    """Transform each Gaussian's mean with its class's transform."""
    out = base_means.copy()
    for c in range(len(class_to_xf)):
        sel = classes == c
        if not np.any(sel):
            continue
        xf = xforms[int(class_to_xf[c])]
        out[sel] = base_means[sel] @ xf.A.T + xf.b[None, :]
    return out


# -- CMLLR ------------------------------------------------------------------


@dataclass
class CMLLRStats:
    """Row statistics for CMLLR: G (D, D+1, D+1), k (D, D+1), beta."""

    G: np.ndarray
    k: np.ndarray
    beta: float


def cmllr_stats_from_gammas(
    feats: np.ndarray,  # (T, D)
    gamma: np.ndarray,  # (T, M) per-Gaussian posteriors
    means: np.ndarray,
    variances: np.ndarray,
) -> CMLLRStats:
    """Accumulate CMLLR row stats for one utterance (host or device-fed).

      G_i = sum_t c_i(t) xi(t) xi(t)^T,  c_i(t) = sum_m gamma_m(t)/var_mi
      k_i = sum_t [sum_m gamma_m(t) mu_mi / var_mi] xi(t)
    """
    T, D = feats.shape
    xi = np.concatenate([np.ones((T, 1)), feats], axis=1)  # (T, D+1)
    inv_var = 1.0 / variances.astype(np.float64)  # (M, D)
    c = gamma @ inv_var  # (T, D)
    mv = gamma @ (means.astype(np.float64) * inv_var)  # (T, D)
    G = np.einsum("ti,ta,tb->iab", c, xi, xi, optimize=True)
    k = np.einsum("ti,ta->ia", mv, xi, optimize=True)
    return CMLLRStats(G=G, k=k, beta=float(gamma.sum()))


def estimate_cmllr(stats: CMLLRStats, n_iter: int = 20) -> Transform:
    """Row-by-row CMLLR estimation with cofactor quadratic (HAdapt.c)."""
    D = stats.k.shape[0]
    W = np.concatenate([np.zeros((D, 1)), np.eye(D)], axis=1)  # init identity
    Ginv = [np.linalg.inv(stats.G[i] + np.eye(D + 1) * 1e-6) for i in range(D)]
    beta = stats.beta
    for _ in range(n_iter):
        for i in range(D):
            A = W[:, 1:]
            cof = np.linalg.inv(A).T * np.linalg.det(A)  # cofactor matrix
            p = np.concatenate([[0.0], cof[i]])  # extended cofactor row
            pG = p @ Ginv[i]
            kG = stats.k[i] @ Ginv[i]
            a_q = pG @ p
            b_q = pG @ stats.k[i]
            # solve alpha: beta/alpha... maximise Q => alpha^2 a + alpha b - beta = 0
            disc = b_q * b_q + 4.0 * a_q * beta
            if a_q <= 0 or disc < 0:
                continue
            alpha1 = (-b_q + np.sqrt(disc)) / (2 * a_q)
            alpha2 = (-b_q - np.sqrt(disc)) / (2 * a_q)

            def obj(alpha):
                w = (alpha * p + stats.k[i]) @ Ginv[i]
                det_term = w @ p
                if det_term <= 0:
                    return -np.inf
                return beta * np.log(abs(det_term)) - 0.5 * w @ stats.G[i] @ w + w @ stats.k[i]

            alpha = alpha1 if obj(alpha1) >= obj(alpha2) else alpha2
            W[i] = (alpha * p + stats.k[i]) @ Ginv[i]
    return Transform(kind="CMLLR", A=W[:, 1:].copy(), b=W[:, 0].copy())


def map_update(
    comp: CompiledHMMSet, accs: Accumulators, tau: float,
    min_occ: float = 1e-3,
) -> np.ndarray:
    """MAP mean update (HMap.c): mu = (tau*mu0 + sumx)/(tau + occ)."""
    occ = np.asarray(accs.occ, np.float64)
    sum_x = np.asarray(accs.sum_x, np.float64)
    mu0 = comp.means.astype(np.float64)
    mu = (tau * mu0 + sum_x) / (tau + occ[:, None])
    mu = np.where(occ[:, None] > min_occ, mu, mu0)
    return mu.astype(np.float32)


def save_baseclass(path: str, name: str, classes: np.ndarray) -> None:
    """Write a regression base-class file (HAdapt ~b macro role).

    One class id per compiled Gaussian, in `CompiledHMMSet` order; the
    layout is this framework's own (HTK's ~b itemlist form needs the
    reference to verify). [LC]
    """
    n_classes = int(classes.max()) + 1 if len(classes) else 0
    with open(path, "w") as f:
        f.write(f'~b "{name}"\n')
        f.write(f"<NUMCLASSES> {n_classes}\n")
        f.write(f"<GAUSSCLASSES> {len(classes)}\n")
        f.write(" " + " ".join(str(int(c)) for c in classes) + "\n")


def load_baseclass(path: str):
    """Read a base-class file written by `save_baseclass`.

    Returns (name, classes) with classes an (M,) int32 array."""
    toks = open(path).read().split()
    if not toks or toks[0] != "~b":
        HError(7460, "baseclass: %s is not a ~b file", path)
    name = toks[1].strip('"')
    m = int(toks[toks.index("<GAUSSCLASSES>") + 1])
    i = toks.index("<GAUSSCLASSES>") + 2
    classes = np.array([int(t) for t in toks[i : i + m]], dtype=np.int32)
    if len(classes) != m:
        HError(7460, "baseclass: %s truncated (%d of %d ids)",
               path, len(classes), m)
    return name, classes


# -- TMF I/O ----------------------------------------------------------------


def save_tmf_classes(path: str, name: str, xforms, class_to_xf: np.ndarray,
                     classes: np.ndarray) -> None:
    """Multi-transform TMF: regression-class MLLR set (~a + class maps)."""
    D = xforms[0].A.shape[0]
    with open(path, "w") as f:
        f.write(f'~a "{name}"\n')
        f.write(f"<ADAPTKIND> MLLRCLASSES\n<VECSIZE> {D}\n")
        f.write(f"<NUMXFORMS> {len(xforms)}\n")
        f.write(f"<GAUSSCLASSES> {len(classes)}\n")
        f.write(" " + " ".join(str(int(c)) for c in classes) + "\n")
        f.write(f"<CLASSXFORM> {len(class_to_xf)}\n")
        f.write(" " + " ".join(str(int(i)) for i in class_to_xf) + "\n")
        for k, xf in enumerate(xforms):
            f.write(f"<XFORMID> {k}\n<BIAS> {D}\n")
            f.write(" " + " ".join("%.6e" % v for v in xf.b) + "\n")
            f.write(f"<XFORM> {D} {D}\n")
            for row in xf.A:
                f.write(" " + " ".join("%.6e" % v for v in row) + "\n")


def load_tmf_classes(path: str):
    """Load a MLLRCLASSES TMF; returns (name, xforms, class_to_xf, classes)
    or None when the file is a plain single-transform TMF."""
    toks = open(path).read().split()
    if "<ADAPTKIND>" not in toks:
        return None
    kind = toks[toks.index("<ADAPTKIND>") + 1]
    if kind != "MLLRCLASSES":
        return None
    name = toks[1].strip('"') if toks[0] == "~a" else "unnamed"
    i = 0
    D = 0
    classes = None
    class_to_xf = None
    xforms = []
    cur_b = None
    while i < len(toks):
        t = toks[i]
        if t == "<VECSIZE>":
            D = int(toks[i + 1]); i += 2
        elif t == "<GAUSSCLASSES>":
            n = int(toks[i + 1])
            classes = np.array([int(x) for x in toks[i + 2 : i + 2 + n]],
                               np.int32)
            i += 2 + n
        elif t == "<CLASSXFORM>":
            n = int(toks[i + 1])
            class_to_xf = np.array([int(x) for x in toks[i + 2 : i + 2 + n]],
                                   np.int32)
            i += 2 + n
        elif t == "<BIAS>":
            n = int(toks[i + 1])
            cur_b = np.array([float(x) for x in toks[i + 2 : i + 2 + n]])
            i += 2 + n
        elif t == "<XFORM>":
            r, c = int(toks[i + 1]), int(toks[i + 2])
            vals = [float(x) for x in toks[i + 3 : i + 3 + r * c]]
            xforms.append(Transform(kind="MLLRMEAN",
                                    A=np.array(vals).reshape(r, c),
                                    b=cur_b))
            i += 3 + r * c
        else:
            i += 1
    if classes is None or class_to_xf is None or not xforms:
        HError(7460, "load_tmf_classes: malformed %s", path)
    return name, xforms, class_to_xf, classes


def save_tmf(path: str, name: str, xf: Transform) -> None:
    D = xf.A.shape[0]
    with open(path, "w") as f:
        f.write(f'~a "{name}"\n')
        f.write(f"<ADAPTKIND> {xf.kind}\n")
        f.write(f"<VECSIZE> {D}\n")
        f.write(f"<BIAS> {D}\n")
        f.write(" " + " ".join("%.6e" % v for v in xf.b) + "\n")
        f.write(f"<XFORM> {D} {D}\n")
        for row in xf.A:
            f.write(" " + " ".join("%.6e" % v for v in row) + "\n")


def load_tmf(path: str) -> Tuple[str, Transform]:
    toks = open(path).read().split()
    name = "unnamed"
    kind = "MLLRMEAN"
    i = 0
    b = None
    A = None
    D = 0
    while i < len(toks):
        t = toks[i]
        if t == "~a":
            name = toks[i + 1].strip('"')
            i += 2
        elif t == "<ADAPTKIND>":
            kind = toks[i + 1]
            i += 2
        elif t == "<VECSIZE>":
            D = int(toks[i + 1])
            i += 2
        elif t == "<BIAS>":
            n = int(toks[i + 1])
            b = np.array([float(x) for x in toks[i + 2 : i + 2 + n]])
            i += 2 + n
        elif t == "<XFORM>":
            r, c = int(toks[i + 1]), int(toks[i + 2])
            vals = [float(x) for x in toks[i + 3 : i + 3 + r * c]]
            A = np.array(vals).reshape(r, c)
            i += 3 + r * c
        else:
            i += 1
    if A is None or b is None:
        HError(7460, "load_tmf: malformed transform file %s", path)
    return name, Transform(kind=kind, A=A, b=b)
