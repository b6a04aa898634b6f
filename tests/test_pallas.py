"""Pallas kernel tests (interpret mode on CPU; the real-TPU path is driven
by the bench/verify flows)."""

import numpy as np
import pytest

from aether_primitives_tpu.ops.pallas import cmul as pk
from aether_primitives_tpu.ops.pallas import stream as st


@pytest.mark.parametrize("shape", [(128,), (8, 256), (3, 5, 128)])
@pytest.mark.parametrize("conj_b,scale", [(False, 1.0), (True, 0.5)])
def test_cmul_matches_reference(rng, shape, conj_b, scale):
    args = [rng.normal(size=shape).astype(np.float32) for _ in range(4)]
    got = pk.cmul(*args, conj_b=conj_b, scale=scale, interpret=True)
    ref = pk.cmul_reference(*args, conj_b=conj_b, scale=scale)
    assert np.allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-6)
    assert np.allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-6)


def test_streamed_cmul_double_buffered(rng):
    rows, lanes, chunk = 1024, 256, 256
    xr = rng.normal(size=(rows, lanes)).astype(np.float32)
    xi = rng.normal(size=(rows, lanes)).astype(np.float32)
    rr = rng.normal(size=(chunk, lanes)).astype(np.float32)
    ri = rng.normal(size=(chunk, lanes)).astype(np.float32)
    got = st.streamed_cmul(xr, xi, rr, ri, chunk_rows=chunk, interpret=True)
    ref = st.streamed_cmul_reference(xr, xi, rr, ri)
    assert np.allclose(np.asarray(got[0]), np.asarray(ref[0]), atol=1e-5)
    assert np.allclose(np.asarray(got[1]), np.asarray(ref[1]), atol=1e-5)


def test_streamed_cmul_rejects_indivisible(rng):
    x = rng.normal(size=(100, 128)).astype(np.float32)
    r = rng.normal(size=(64, 128)).astype(np.float32)
    with pytest.raises(ValueError, match="divisible"):
        st.streamed_cmul(x, x, r, r, chunk_rows=64, interpret=True)


def test_halo_rdma_matches_ppermute(eight_devices):
    import jax
    import jax.numpy as jnp

    from aether_primitives_tpu.ops.pallas.halo_rdma import halo_left_rdma
    from aether_primitives_tpu.parallel import halo, mesh as mesh_mod

    mesh = mesh_mod.make_mesh({"time": 8})
    P = jax.sharding.PartitionSpec
    x = jnp.arange(8.0 * 16).astype(jnp.float32)

    def via_rdma(xs):
        return halo_left_rdma(xs, 4, "time", interpret=True)

    def via_ppermute(xs):
        return halo.left_tail(xs, 4, "time")

    run = lambda f: np.asarray(
        jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=P("time"), out_specs=P("time"), check_vma=False)
        )(x)
    )
    a = run(via_rdma)
    b = run(via_ppermute)
    assert (a == b).all()


def test_halo_rdma_multi_axis_interpret_rejected_with_guidance():
    # hardware addresses multi-axis meshes via mesh-coordinate device ids,
    # but jax's dma_start discharge (interpret mode) only implements
    # single-axis meshes — the wrapper must refuse loudly and name the
    # ppermute fallback instead of tripping jax's internal error
    import jax.numpy as jnp

    from aether_primitives_tpu.ops.pallas.halo_rdma import halo_left_rdma

    with pytest.raises(NotImplementedError, match="left_tail"):
        halo_left_rdma(
            jnp.zeros(16, jnp.float32), 4, "time",
            mesh_axis_names=("channel", "time"), interpret=True,
        )
    with pytest.raises(ValueError, match="not in mesh axes"):
        halo_left_rdma(
            jnp.zeros(16, jnp.float32), 4, "nope",
            mesh_axis_names=("channel", "time"), interpret=True,
        )


def test_halo_rdma_multi_axis_hardware_trace_builds_mesh_device_id():
    # the hardware path must construct the {axis: right} mesh-coordinate
    # device id; abstract tracing through shard_map over a 2-axis mesh
    # exercises kernel construction + dict addressing up to (but not
    # including) Mosaic lowering, which requires a real TPU
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from aether_primitives_tpu.ops.pallas.halo_rdma import halo_left_rdma
    from aether_primitives_tpu.parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh({"channel": 2, "time": 4})

    def fn(x):
        return halo_left_rdma(
            x, 4, "time", mesh_axis_names=("channel", "time"), interpret=False
        )

    sharded = jax.shard_map(
        fn, mesh=mesh, in_specs=P("channel", "time"),
        out_specs=P("channel", "time"), check_vma=False,
    )
    shape = jax.eval_shape(sharded, jnp.zeros((2, 32), jnp.float32))
    assert shape.shape == (2, 16)  # 4 halo samples per time shard


def test_rx_frame_megakernel_matches_reference_interpret():
    # the whole-chain Pallas kernel (stage1 MXU dots + stage2 VPU reduce +
    # wrap correction + sign demod + bit pack) vs the f64 reference, in
    # interpret mode, incl. the streaming history path
    import numpy as np

    from aether_primitives_tpu.cli import numpy_reference_bits
    from aether_primitives_tpu.models.modem import _default_lowpass
    from aether_primitives_tpu.ops.pallas.rx_frame import rx_frame_qpsk_bits

    rng = np.random.default_rng(100)
    dec, n_fft = 4, 256
    span = dec * n_fft
    n = span * 8
    x = (rng.normal(size=n) + 1j * rng.normal(size=n)).astype(np.complex64)
    taps = _default_lowpass(65, 1.0 / 8)
    ref = numpy_reference_bits(x, taps, dec, n_fft)
    bits = np.asarray(
        rx_frame_qpsk_bits(x.real.copy(), x.imag.copy(), taps, dec, n_fft,
                           interpret=True)
    )
    assert (bits == ref).mean() == 1.0
    k = taps.shape[-1]
    h = n // 2
    b1 = np.asarray(
        rx_frame_qpsk_bits(x.real[:h].copy(), x.imag[:h].copy(), taps, dec,
                           n_fft, interpret=True)
    )
    b2 = np.asarray(
        rx_frame_qpsk_bits(
            x.real[h:].copy(), x.imag[h:].copy(), taps, dec, n_fft,
            history=(x.real[h - (k - 1):h].copy(), x.imag[h - (k - 1):h].copy()),
            interpret=True,
        )
    )
    assert (np.concatenate([b1, b2]) == ref).mean() == 1.0


def test_bcjr_kernel_matches_xla_interpret(rng):
    """The resident-metric Pallas BCJR (ops/pallas/bcjr.py) must be
    BIT-identical to the XLA windowed scan — same expression tree, so no
    tolerance: windowed LLRs and full turbo decodes both."""
    from aether_primitives_tpu.ops import turbo as T

    B, n = 3, 1000
    ls = (rng.normal(size=(B, n)) * 3).astype(np.float32)
    lp = (rng.normal(size=(B, n)) * 3).astype(np.float32)
    la = rng.normal(size=(B, n)).astype(np.float32)
    x = np.asarray(T._bcjr_maxlog_windowed(ls, lp, la, 64, 16,
                                           backend="xla"))
    p = np.asarray(T._bcjr_maxlog_windowed(ls, lp, la, 64, 16,
                                           backend="pallas_interpret"))
    assert np.array_equal(x, p)

    # end-to-end: full iterative turbo decode through the kernel
    bits = rng.integers(0, 2, (2, 512)).astype(np.uint8)
    from aether_primitives_tpu.ops.turbo import turbo_decode, turbo_encode

    encs = [[np.asarray(v) for v in turbo_encode(bits[i])] for i in range(2)]
    sigma = 0.8
    args = tuple(
        np.stack([
            (2.0 / sigma**2) * ((1.0 - 2.0 * encs[i][j].astype(np.float64))
                                + sigma * rng.normal(size=encs[i][j].shape))
            for i in range(2)
        ]).astype(np.float32)
        for j in range(5)
    )
    dx, lx = turbo_decode(*args, iterations=4, window=64, guard=16,
                          bcjr_backend="xla")
    dp_, lp_ = turbo_decode(*args, iterations=4, window=64, guard=16,
                            bcjr_backend="pallas_interpret")
    assert np.array_equal(np.asarray(dx), np.asarray(dp_))
    assert np.array_equal(np.asarray(lx), np.asarray(lp_))


def test_viterbi_kernel_matches_xla_interpret(rng):
    """The resident-metric Pallas Viterbi (ops/pallas/viterbi.py) must be
    BIT-identical to the XLA scans in every mode: full-block and
    windowed, single-stream and batched (batch on the lane axis)."""
    from aether_primitives_tpu.ops import fec

    bits = rng.integers(0, 2, 500).astype(np.uint8)
    enc = np.asarray(fec.conv_encode(bits))
    llr = ((1 - 2.0 * enc) * 3 + rng.normal(size=enc.shape)).astype(np.float32)
    for kw in ({}, {"window": 64, "guard": 48}):
        x = np.asarray(fec.viterbi_decode(llr, backend="xla", **kw))
        p = np.asarray(fec.viterbi_decode(llr, backend="pallas_interpret",
                                          **kw))
        assert np.array_equal(x, p), kw

    B = 3
    bb = rng.integers(0, 2, (B, 400)).astype(np.uint8)
    encs = np.stack([np.asarray(fec.conv_encode(bb[i])) for i in range(B)])
    llrs = ((1 - 2.0 * encs) * 3
            + rng.normal(size=encs.shape)).astype(np.float32)
    for kw in ({}, {"window": 64, "guard": 48}):
        x = np.asarray(fec.viterbi_decode(llrs, backend="xla", **kw))
        p = np.asarray(fec.viterbi_decode(llrs, backend="pallas_interpret",
                                          **kw))
        assert np.array_equal(x, p), kw
    assert np.array_equal(
        np.asarray(fec.viterbi_decode(llrs, backend="pallas_interpret")), bb
    )


def test_viterbi_kernel_other_code_rates_interpret(rng):
    """Kernel generality: K=5 rate-1/3 code decodes identically too (the
    iota-parity branch metrics must track any polys/constraint)."""
    from aether_primitives_tpu.ops import fec

    polys, k = (0o25, 0o33, 0o37), 5
    bits = rng.integers(0, 2, 300).astype(np.uint8)
    enc = np.asarray(fec.conv_encode(bits, polys, k))
    llr = ((1 - 2.0 * enc) * 3 + rng.normal(size=enc.shape)).astype(np.float32)
    x = np.asarray(fec.viterbi_decode(llr, polys, k, backend="xla"))
    p = np.asarray(fec.viterbi_decode(llr, polys, k,
                                      backend="pallas_interpret"))
    assert np.array_equal(x, p)
    assert np.array_equal(p, bits)
