"""Fused Pallas scoring kernel (ops/pallas_score.py): interpret-mode
parity with the XLA score packer — float32-rounding-level confidence
agreement, exact bit channels, NaN/inf class preservation — plus the
custom_vmap batched dispatch."""

import numpy as np
import pytest

from minimodem_tpu.models.modem import FskModem


@pytest.fixture()
def interp(monkeypatch):
    from jax.experimental import pallas as pl

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    # CPU backend: force eligibility for the interpret run
    from minimodem_tpu.ops import pallas_demod as PD

    monkeypatch.setattr(PD, "backend_supports_pallas", lambda: True)
    monkeypatch.setenv("MINIMODEM_TPU_PALLAS", "1")
    from minimodem_tpu.ops import pallas_score as PS

    def clear():
        # the consumers cache compiled programs that bake the packer in;
        # leaving fused/interpret variants cached would leak into tests
        # that expect the default XLA packer
        from minimodem_tpu.ops import device_rx as D
        from minimodem_tpu.ops import pallas_rx as PR

        PS._build.cache_clear()
        PS._make_packer.cache_clear()
        D._build_device_rx.cache_clear()
        PR._mega_run_fn.cache_clear()
        PR.build_mega_rx.cache_clear()

    clear()
    yield
    clear()


def _ref_packed(key, t_total, x, monkeypatch):
    """XLA packer output with every pallas path disabled."""
    import jax

    from minimodem_tpu.ops import device_rx as D

    monkeypatch.setenv("MINIMODEM_TPU_PALLAS", "0")
    ref_packer = D.make_score_packer(key, t_total, "float32")
    out = np.asarray(jax.jit(ref_packer)(x))
    monkeypatch.setenv("MINIMODEM_TPU_PALLAS", "1")
    return out


def test_fused_packer_parity(interp, monkeypatch):
    import jax.numpy as jnp

    from minimodem_tpu.ops import device_rx as D
    from minimodem_tpu.ops import pallas_score as PS

    m = FskModem("1200")
    key = D.device_rx_key(m.cfg, "auto")
    geo = D.geo_from_key(key)
    t_total = PS.T_TILE * 2
    assert PS.fused_packer_eligible(geo, t_total)

    wav = m.modulate(b"fused packer parity \x00\xff test")
    x = np.zeros(t_total + geo.halo, np.float32)
    x[:min(len(wav), x.size)] = wav[:x.size]
    xj = jnp.asarray(x)

    ref = _ref_packed(key, t_total, xj, monkeypatch)
    fused = PS.make_fused_packer(geo, D.make_basis(geo, np.float32),
                                 t_total)
    out = np.asarray(fused(xj))

    assert out.shape == ref.shape == (8, t_total)
    # bit channels must be exact (they drive the decoded bytes)
    np.testing.assert_array_equal(out[4], ref[4])
    np.testing.assert_array_equal(out[5], ref[5])
    for ch in range(4):
        r = ref[ch].view(np.float32)
        o = out[ch].view(np.float32)
        assert np.array_equal(np.isnan(r), np.isnan(o))
        assert np.array_equal(np.isposinf(r), np.isposinf(o))
        fin = np.isfinite(r)
        np.testing.assert_allclose(o[fin], r[fin], rtol=2e-6, atol=1e-5)


def test_fused_packer_planes_mxp1_parity(interp, monkeypatch):
    """Planes (v3) layout with pass 1 on the MXU vs both the XLA packer
    and the VPU pass-1 planes build: bit channel exact, conf/ampl at
    float32-rounding agreement, NaN class preserved (zero-tail offsets
    score 0/0)."""
    import jax.numpy as jnp

    from minimodem_tpu.ops import device_rx as D
    from minimodem_tpu.ops import pallas_score as PS

    m = FskModem("1200")
    key = D.device_rx_key(m.cfg, "auto")
    geo = D.geo_from_key(key)
    t_total = PS.T_TILE
    n_ch, rows = PS.plane_rows(geo.n_bits, geo.req_data, geo.req_sync)
    assert n_ch == 4, "Bell202 uses the 4-row common layout"

    wav = m.modulate(b"planes mxp1 parity \x00\xff")
    x = np.zeros(t_total + geo.halo, np.float32)
    x[:min(len(wav), x.size)] = wav[:x.size]
    xj = jnp.asarray(x)
    ref = _ref_packed(key, t_total, xj, monkeypatch)
    basis = D.make_basis(geo, np.float32)

    outs = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("MINIMODEM_TPU_MXP1", flag)
        PS._build.cache_clear()
        PS._make_packer.cache_clear()
        fused = PS.make_fused_packer(geo, basis, t_total, planes=True)
        outs[flag] = np.asarray(fused(xj))

    for flag, out in outs.items():
        assert out.shape == (4, t_total)
        np.testing.assert_array_equal(out[rows["bl"]], ref[4],
                                      err_msg=f"MXP1={flag}")
        for prow, vref in ((rows["cd"], ref[0]), (rows["ad"], ref[2])):
            r = vref.view(np.float32)
            o = out[prow].view(np.float32)
            assert np.array_equal(np.isnan(r), np.isnan(o)), flag
            assert np.array_equal(np.isposinf(r), np.isposinf(o)), flag
            fin = np.isfinite(r)
            np.testing.assert_allclose(o[fin], r[fin], rtol=2e-6,
                                       atol=1e-5, err_msg=f"MXP1={flag}")


def test_fused_packer_vmap(interp):
    import jax
    import jax.numpy as jnp

    from minimodem_tpu.ops import device_rx as D
    from minimodem_tpu.ops import pallas_score as PS

    m = FskModem("1200")
    key = D.device_rx_key(m.cfg, "auto")
    geo = D.geo_from_key(key)
    t_total = PS.T_TILE
    fused = PS.make_fused_packer(geo, D.make_basis(geo, np.float32),
                                 t_total)

    rng = np.random.default_rng(5)
    xb = rng.standard_normal((3, t_total + geo.halo)).astype(np.float32)
    batched = np.asarray(jax.vmap(fused)(jnp.asarray(xb)))
    for i in range(3):
        single = np.asarray(fused(jnp.asarray(xb[i])))
        np.testing.assert_array_equal(batched[i], single)


def test_fused_decode_end_to_end(interp):
    """A full decode through the device receiver with the fused packer
    engaged produces the exact transmitted bytes."""
    from minimodem_tpu.ops.device_rx import DeviceReceiver

    m = FskModem("1200")
    payload = b"end to end through the fused scorer"
    wav = m.modulate(payload)
    rx = DeviceReceiver(m.cfg)
    events, _ = rx.run_events_batch(wav[None, :], [len(wav)], 1.5, 2.3)
    import io

    from minimodem_tpu.codecs import get_codec
    from minimodem_tpu.config import RxOptions
    from minimodem_tpu.rx.engine import Receiver

    sink = io.BytesIO()
    r = Receiver(m.cfg, RxOptions(), get_codec("ascii8"), sink.write,
                 lambda s: None)
    r.render_events(*events[0])
    assert sink.getvalue() == payload


@pytest.mark.parametrize("mode,kwargs", [
    # nb=797 / max_begin=7965: round-8 slack once pushed the im2col copy
    # past the concatenated input blocks (trace-time crash)
    ("60.26", {}),
    # max_begin=5120 (multiple of 1024): zero round-8 slack once pushed
    # the overlapped-plane copy one row past the corr rows
    ("93.75", {}),
])
def test_fused_packer_slice_bounds(interp, monkeypatch, mode, kwargs):
    """Geometries whose static-slice bounds once exceeded the scratch
    shapes: supported() must only admit what _build can trace, and the
    traced kernel must agree with the XLA packer."""
    import jax.numpy as jnp

    from minimodem_tpu.ops import device_rx as D
    from minimodem_tpu.ops import pallas_score as PS

    m = FskModem(mode, **kwargs)
    key = D.device_rx_key(m.cfg, "float32")
    geo = D.geo_from_key(key)
    t_total = PS.T_TILE
    if not PS.fused_packer_eligible(geo, t_total):
        pytest.skip("geometry not fused-eligible")

    rng = np.random.default_rng(7)
    x = rng.standard_normal(t_total + geo.halo).astype(np.float32)
    xj = jnp.asarray(x)
    fused = PS.make_fused_packer(geo, D.make_basis(geo, np.float32),
                                 t_total)
    out = np.asarray(fused(xj))            # must trace + run
    ref = _ref_packed(key, t_total, xj, monkeypatch)
    np.testing.assert_array_equal(out[4], ref[4])
    np.testing.assert_array_equal(out[5], ref[5])
