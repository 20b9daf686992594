"""Pallas VPU FFT oracle tests (interpret on CPU, compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_matcher_tpu.ops.pallas_fft import (
    _brev_host,
    fft2_scrambled,
    split_factors,
)

INTERPRET = jax.default_backend() != "tpu"


def _layout_ref(X, n):
    A, M = split_factors(n)
    sa, sm = _brev_host(A), _brev_host(M)
    return X.reshape(-1, n)[:, (sa[:, None] + A * sm[None, :]).reshape(-1)]


@pytest.mark.parametrize("n", [1 << 15, 1 << 16])
def test_forward_matches_numpy_layout(rng, n):
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n)))
    yr, yi = fft2_scrambled(
        jnp.asarray(np.real(x), jnp.float32),
        jnp.asarray(np.imag(x), jnp.float32),
        n, interpret=INTERPRET,
    )
    got = np.asarray(yr) + 1j * np.asarray(yi)
    want = _layout_ref(np.fft.fft(x), n)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 3e-6


def test_roundtrip_and_convolution(rng):
    n = 1 << 16
    w = rng.standard_normal(40000).astype(np.float32)
    s = rng.standard_normal(3000).astype(np.float32)
    # pack both real signals in one complex transform
    xr = jnp.asarray(np.pad(w, (0, n - len(w))))[None]
    xi = jnp.asarray(np.pad(s, (0, n - len(s))))[None]
    Zr, Zi = fft2_scrambled(xr, xi, n, interpret=INTERPRET)
    # roundtrip
    br, bi = fft2_scrambled(Zr, Zi, n, inverse=True, interpret=INTERPRET)
    assert np.max(np.abs(np.asarray(br)[0] / n - np.pad(w, (0, n - len(w))))) < 1e-4
    assert np.max(np.abs(np.asarray(bi)[0] / n - np.pad(s, (0, n - len(s))))) < 1e-4

    # correlation: conj(S) product in scrambled layout == np oracle
    Sr, Si = fft2_scrambled(
        jnp.asarray(np.pad(s, (0, n - len(s))))[None],
        jnp.zeros((1, n), jnp.float32), n, interpret=INTERPRET,
    )
    Xr, Xi = fft2_scrambled(
        jnp.asarray(np.pad(w, (0, n - len(w))))[None],
        jnp.zeros((1, n), jnp.float32), n, interpret=INTERPRET,
    )
    Cr = Xr * Sr + Xi * Si
    Ci = Xi * Sr - Xr * Si
    cr, ci = fft2_scrambled(Cr, Ci, n, inverse=True, interpret=INTERPRET)
    valid = len(w) - len(s) + 1
    got = np.asarray(cr)[0][:valid] / n
    want = np.fft.irfft(
        np.fft.rfft(w, n) * np.conj(np.fft.rfft(s, n)), n
    )[:valid]
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 3e-6


def test_vpu_impl_equality_matcher_and_scanner(rng):
    """fft_impl='vpu' (pallas VPU FFT) finds identical peaks to 'xla' in
    both the single-query matcher and the multi-query sharded scanner
    (shapes large enough for the two-factor transform)."""
    from audio_matcher_tpu.models.matcher import MatchConfig, SnippetMatcher
    from audio_matcher_tpu.parallel.mesh import make_mesh
    from audio_matcher_tpu.parallel.sweep import ShardedScanner

    SR = 8000
    snippet = (rng.standard_normal(2 * SR) * 0.2).astype(np.float32)
    episode = (rng.standard_normal(45 * SR) * 0.05).astype(np.float32)
    for off in (7, 30):
        episode[off * SR : off * SR + len(snippet)] = snippet

    base = dict(chunk_secs=10, distance_secs=15, slab=3)  # odd: pad row
    # ("vpu", "pallas") is the fully-fused production path: product in the
    # inverse FFT's minor pass, de-interleave + scale in the peak kernel
    impls = [("xla", "jnp"), ("vpu", "jnp"), ("vpu", "pallas")]
    got = {}
    for impl, peaks in impls:
        m = SnippetMatcher(
            snippet, SR,
            MatchConfig(fft_impl=impl, peaks_impl=peaks, **base),
        )
        if impl == "vpu":
            assert m.fft_impl == "vpu" and m.fft_len >= 1 << 14
        got[impl, peaks] = [
            (p.position, round(p.height, 5)) for p in m.match(episode)
        ]
    assert got["vpu", "jnp"] == got["xla", "jnp"]
    assert got["vpu", "pallas"] == got["xla", "jnp"]
    assert [p for p, _ in got["xla", "jnp"]] == [7 * SR, 30 * SR]

    snippets = [
        snippet,
        (rng.standard_normal(SR) * 0.2).astype(np.float32),
        (rng.standard_normal(3 * SR // 2) * 0.2).astype(np.float32),
    ]  # odd query count: exercises the packed pad query
    eps = [episode, episode[: 40 * SR]]
    outs = {}
    for impl, peaks in impls:
        cfg = MatchConfig(fft_impl=impl, peaks_impl=peaks, **base)
        sc = ShardedScanner(snippets, SR, cfg, make_mesh(1))
        outs[impl, peaks] = [
            [[(p.position, round(p.height, 5)) for p in pk] for pk in per_q]
            for per_q in sc.scan_resident(eps)
        ]
    assert outs["vpu", "jnp"] == outs["xla", "jnp"]
    assert outs["vpu", "pallas"] == outs["xla", "jnp"]


def test_vpu_small_fft_falls_back(rng):
    from audio_matcher_tpu.models.matcher import MatchConfig, SnippetMatcher

    SR = 500
    snippet = (rng.standard_normal(SR) * 0.2).astype(np.float32)
    m = SnippetMatcher(
        snippet, SR, MatchConfig(chunk_secs=2, distance_secs=4, fft_impl="vpu")
    )
    assert m.fft_impl == "xla_packed"  # fft too small for two 128 factors
    episode = (rng.standard_normal(10 * SR) * 0.05).astype(np.float32)
    episode[3 * SR : 4 * SR] = snippet
    assert [p.position for p in m.match(episode)] == [3 * SR]


def test_cross_impl_fuzz_random_configs(rng):
    """All fft_impl × peaks_impl combinations agree on peak positions for
    random configs whose fft_len clears the VPU two-factor minimum."""
    from audio_matcher_tpu.models.matcher import MatchConfig, SnippetMatcher

    SR = 4000
    for trial in range(3):
        m_secs = float(rng.uniform(0.8, 1.6))
        chunk = float(rng.uniform(3.5, 6.0))
        snippet = (rng.standard_normal(int(m_secs * SR)) * 0.2).astype(
            np.float32
        )
        episode = (rng.standard_normal(int(25 * SR)) * 0.05).astype(
            np.float32
        )
        # keep plants farther apart than any drawn distance (≤3 s): two
        # equal-height plants within the suppression radius tie, and
        # exact ties resolve nondeterministically on threaded-CPU hosts
        while True:
            offs = sorted(
                rng.choice(np.arange(2, 22), size=2, replace=False).tolist()
            )
            if offs[1] - offs[0] >= 4:
                break
        for off in offs:
            i = int(off * SR)
            episode[i : i + len(snippet)] = snippet
        base = dict(
            chunk_secs=chunk,
            distance_secs=float(rng.uniform(1.0, 3.0)),
            slab=int(rng.integers(2, 4)),
            block=256,
        )
        got = {}
        for impl, peaks in (
            ("xla", "jnp"), ("xla_packed", "pallas"),
            ("vpu", "pallas"), ("mxu", "jnp"),
        ):
            mm = SnippetMatcher(
                snippet, SR,
                MatchConfig(fft_impl=impl, peaks_impl=peaks, **base),
            )
            got[impl, peaks] = [
                p.position for p in mm.match(episode) if p.height > 0.5
            ]
        ref = got["xla", "jnp"]
        assert set(int(o * SR) for o in offs) <= set(ref), (trial, ref)
        for k, v in got.items():
            assert v == ref, (trial, k, v, ref)
