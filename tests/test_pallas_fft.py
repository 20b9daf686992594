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


@pytest.mark.heavy
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


@pytest.mark.heavy
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


@pytest.mark.parametrize("transfer", ["int16", "mulaw8", "float32"])
def test_wire_planes_match_f32_planes(rng, transfer):
    """corr_slab_vpu_planes_wire (dequant + pad + real-input fused into
    the forward major kernel) must reproduce corr_slab_vpu_planes on the
    dequantized windows for every staging wire format."""
    from audio_matcher_tpu.models.matcher import (
        dequantize_on_device,
        quantize_wire,
    )
    from audio_matcher_tpu.ops.pallas_fft import (
        corr_slab_vpu_planes,
        corr_slab_vpu_planes_wire,
        scrambled_query_spectra,
    )

    n = 1 << 15
    A, M = split_factors(n)
    W = n - 3 * M  # pad tail exercised
    B, Q = 2, 2
    wire = quantize_wire(
        (rng.standard_normal((B, W)) * 0.12).astype(np.float32), transfer
    )
    snippets = (rng.standard_normal((Q, 500)) * 0.12).astype(np.float32)
    t_r, t_i = scrambled_query_spectra(snippets, n, pack=True)
    width = (W // (8 * M)) * (8 * M)
    f32_windows = dequantize_on_device(jnp.asarray(wire))
    want_r, want_i = corr_slab_vpu_planes(
        f32_windows, t_r, t_i, width, interpret=INTERPRET
    )
    got_r, got_i = corr_slab_vpu_planes_wire(
        jnp.asarray(wire), t_r, t_i, width, interpret=INTERPRET
    )
    scale = float(jnp.max(jnp.abs(want_r))) or 1.0
    assert float(jnp.max(jnp.abs(got_r - want_r))) / scale < 1e-6
    assert float(jnp.max(jnp.abs(got_i - want_i))) / scale < 1e-6


@pytest.mark.parametrize("transfer", ["int16", "mulaw8"])
def test_single_query_wire_planes_match(rng, transfer):
    """Packed-pair wire forward (fft_major_fwd_wire2) must reproduce the
    f32 single-query planes, odd window counts included."""
    from audio_matcher_tpu.models.matcher import (
        dequantize_on_device,
        quantize_wire,
    )
    from audio_matcher_tpu.ops.pallas_fft import (
        corr_single_query_vpu_planes,
        corr_single_query_vpu_planes_wire,
        scrambled_query_spectra,
    )

    n = 1 << 15
    A, M = split_factors(n)
    W = n - 3 * M
    B = 3  # odd: exercises the pad row
    wire = quantize_wire(
        (rng.standard_normal((B, W)) * 0.12).astype(np.float32), transfer
    )
    snippet = (rng.standard_normal((1, 400)) * 0.12).astype(np.float32)
    s_r, s_i = scrambled_query_spectra(snippet, n, pack=False)
    width = (W // (8 * M)) * (8 * M)
    want_r, want_i = corr_single_query_vpu_planes(
        dequantize_on_device(jnp.asarray(wire)), s_r, s_i, width,
        interpret=INTERPRET,
    )
    got_r, got_i = corr_single_query_vpu_planes_wire(
        jnp.asarray(wire), s_r, s_i, width, interpret=INTERPRET
    )
    scale = float(jnp.max(jnp.abs(want_r))) or 1e-6
    # plane row p holds corr(w_2p) in real / corr(w_2p+1) in imag; with
    # odd B the final imag half is the PAD window — its values differ
    # between the paths (f32 pads zeros, wire pads wire-code 0, which for
    # mu-law decodes to ~-0.5) and are masked by valid_len=0 downstream,
    # so compare only the planes backed by real windows
    full = B // 2
    assert float(
        jnp.max(jnp.abs(got_r[: full + 1] - want_r[: full + 1]))
    ) / scale < 1e-6
    assert float(jnp.max(jnp.abs(got_i[:full] - want_i[:full]))) / scale < 1e-6
