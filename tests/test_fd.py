"""Frequent Directions kernel: guarantee, merge, codec round-trip."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.codec import SketchParamMismatch
from sketchlib.fd import FrequentDirections


def _check_guarantee(fd: FrequentDirections, A: np.ndarray) -> None:
    G = A.T @ A
    D = G - fd.cov_sketch()
    eig = np.linalg.eigvalsh(D)
    tol = 1e-6 * max(1.0, fd.fro2)
    # PSD lower side: B never overestimates any direction
    assert eig.min() >= -tol
    # certified upper side: exact shrinkage total
    assert eig.max() <= fd.delta_total + tol
    # standard accounting bound on the certificate itself
    assert fd.delta_total <= (fd.fro2 - np.sum(fd.sketch_matrix**2)) / fd.l + tol
    assert fd.fro2 == pytest.approx(np.sum(A**2), rel=1e-9)
    assert fd.n == A.shape[0]


@pytest.mark.parametrize("n,dim,l", [(500, 16, 8), (1000, 32, 16), (64, 8, 4)])
def test_fd_guarantee_single_stream(n, dim, l):
    rng = np.random.default_rng(3)
    # low-rank + noise: the regime FD is for
    A = rng.standard_normal((n, 4)) @ rng.standard_normal((4, dim))
    A += 0.1 * rng.standard_normal((n, dim))
    fd = FrequentDirections(l, dim)
    fd.update(A.reshape(-1))
    _check_guarantee(fd, A)


def test_fd_merge_guarantee_and_associativity():
    rng = np.random.default_rng(7)
    dim, l = 24, 12
    parts = [rng.standard_normal((int(rng.integers(10, 400)), dim)) for _ in range(5)]
    A = np.vstack(parts)
    fds = []
    for p in parts:
        f = FrequentDirections(l, dim)
        f.update(p.reshape(-1))
        fds.append(f)
    blobs = [f.to_bytes() for f in fds]  # merge mutates: work on copies

    def fresh(i):
        return FrequentDirections.from_bytes(blobs[i])

    left = fresh(0)
    for i in range(1, 5):
        left = left.merge(fresh(i))
    _check_guarantee(left, A)
    # different merge shapes still satisfy the guarantee
    right = fresh(4)
    for i in reversed(range(4)):
        right = right.merge(fresh(i))
    _check_guarantee(right, A)


def test_fd_principal_subspace_recovers_planted():
    rng = np.random.default_rng(11)
    dim = 32
    v = rng.standard_normal(dim)
    v /= np.linalg.norm(v)
    A = np.outer(rng.standard_normal(3000), v) + 0.01 * rng.standard_normal((3000, dim))
    fd = FrequentDirections(8, dim)
    fd.update(A.reshape(-1))
    top = fd.principal_directions(1)[0]
    assert abs(top @ v) > 0.999


def test_fd_codec_roundtrip_and_errors():
    rng = np.random.default_rng(5)
    fd = FrequentDirections(6, 10)
    fd.update(rng.standard_normal(370).astype(np.float64)[:370 - 370 % 10])
    blob = fd.to_bytes()
    back = FrequentDirections.from_bytes(blob)
    assert back.n == fd.n and back.l == fd.l and back.dim == fd.dim
    assert back.fro2 == fd.fro2 and back.delta_total == fd.delta_total
    assert np.array_equal(back.sketch_matrix, fd.sketch_matrix)
    assert back.to_bytes() == blob
    with pytest.raises(SketchParamMismatch):
        fd.merge(FrequentDirections(6, 11))
    with pytest.raises(ValueError):
        fd.update(np.ones(7))  # not a multiple of dim
    assert FrequentDirections(4, 3).is_empty()


def test_fd_l_clamped_to_dim_keeps_accounting():
    """l > dim must not violate delta_total <= (fro2 - ||B||_F^2)/l
    (ADVICE r3: each shrink removes only ~dim*delta of mass, so a
    wider-than-dim sketch breaks the bound). The ctor clamps l to dim."""
    rng = np.random.default_rng(17)
    dim = 4
    fd = FrequentDirections(8, dim)
    assert fd.l == dim  # clamped
    A = rng.standard_normal((600, dim))
    fd.update(A.reshape(-1))
    _check_guarantee(fd, A)
    # merge of two clamped sketches stays mergeable and bounded
    other = FrequentDirections(8, dim)
    B = rng.standard_normal((400, dim))
    other.update(B.reshape(-1))
    fd.merge(other)
    _check_guarantee(fd, np.vstack([A, B]))


def test_fd_merge_equals_whole_bound():
    """Split ≡ whole in the CERTIFICATE sense: both satisfy the
    guarantee and the split path's certified bound stays within 2x of
    the single-stream one on benign data."""
    rng = np.random.default_rng(13)
    A = rng.standard_normal((2000, 16))
    whole = FrequentDirections(10, 16)
    whole.update(A.reshape(-1))
    ha, hb = FrequentDirections(10, 16), FrequentDirections(10, 16)
    ha.update(A[:1000].reshape(-1))
    hb.update(A[1000:].reshape(-1))
    merged = ha.merge(hb)
    _check_guarantee(whole, A)
    _check_guarantee(merged, A)
    assert merged.n == whole.n and merged.fro2 == pytest.approx(whole.fro2)


def test_from_bytes_legacy_wide_blob():
    """Blobs written before the l <= dim clamp (l > dim, buffer up to
    2*l_old rows) must still load: rows fold through update() and the
    accounting bound keeps holding."""
    import struct

    import numpy as np

    from sketchlib.codec import pack
    from sketchlib.fd import FrequentDirections

    rng = np.random.default_rng(3)
    dim, l_old, rows = 4, 8, 12  # 12 rows > 2*dim
    mat = rng.standard_normal((rows, dim))
    fro2 = float((mat * mat).sum())
    payload = struct.pack("<qqdd", rows, rows, fro2, 0.0) + mat.astype(
        np.float64
    ).tobytes()
    blob = pack("fd", {"l": l_old, "dim": dim}, payload)
    out = FrequentDirections.from_bytes(blob)
    assert out.l == dim and out.n == rows and out.fro2 == fro2
    # covariance error bound still certified: delta_total within the
    # exact-shrinkage accounting ((fro2 - ||B||_F^2) / l)
    bf2 = float((out._buf[: out._rows] ** 2).sum())
    assert out.delta_total <= (out.fro2 - bf2) / out.l + 1e-9
