"""EXPERIMENTAL: the carrier state machine as one Pallas TPU kernel.

STATUS (end of round 1): compiles and runs on real TPU with event-for-event
parity against the XLA receiver (interpret-mode parity is also tested in
CI: tests/test_pallas_rx.py).  Mosaic gotchas fixed along the way: no
captured array constants, no scalar bitcasts (i32/f32 lane-vector blends),
no unsigned or bool-typed reductions, no odd-length 1-D scans, int32 loop
flags, 128-aligned HBM DMA.  Current per-frame in-kernel cost is ~26 us
(un-overlapped window DMA + two [K, W_FETCH] one-hot scans), so it beats
the XLA path ~2x single-stream but not yet batched — round-2 work:
double-buffer the window DMA, shrink W_FETCH, and/or run streams
lane-parallel.  The XLA while_loop receiver remains the production path.

The XLA while_loop implementation (ops/device_rx.py stage 3) spends
~50 us per frame on kernel-sequencing overhead (~60 fused kernels per
iteration).  This kernel runs the whole per-stream state machine inside a
single Pallas program: packed score windows are DMA'd HBM->VMEM per frame,
the center-out frame search is VPU vector math over a 128-aligned window,
scalar tracking state lives in loop carries, and events/bytes accumulate
in VMEM until one DMA-out per stream.

Grid = (B,): streams run back-to-back on the core; per-frame cost is one
small DMA + a few VPU ops.  Decisions replay ops/device_rx.py exactly
(same score arrays in, same event records out); tests/test_pallas_rx.py
verifies event-for-event equality against the XLA engine.

Compact mode only (n_data_bits <= 8), no streaming carry yet — this is
the round-2 perf path, opt-in via DeviceReceiver(engine) /
MINIMODEM_TPU_MEGAKERNEL=1.
"""

from __future__ import annotations

import functools

import numpy as np

from .device_rx import (
    EV_CARRIER,
    EV_NOCARRIER,
    FSK_MAX_NOCONFIDENCE_BITS,
    _scan_order,
    FSK_ANALYZE_NSTEPS,
    FSK_ANALYZE_NSTEPS_FINE,
)

# window fetch geometry: candidate offsets live in [0, W_SCAN); we DMA a
# 128-aligned [8, W_FETCH] block so the dynamic position only needs
# 128-granular alignment
W_LANES = 128


def _static_geom(cfg_key):
    (sample_rate, data_rate_bits, n_data_bits, nstartbits, nstopbits_bits,
     b_mark, b_space, fftsize, nb, magscalar_bits, bit_begin, n_bits,
     req_data, req_sync, use_f64, frame_nsamples, overscan,
     expect_nsamples, msb_first, do_rx_sync, sync_byte) = cfg_key
    data_rate_f = np.uint32(data_rate_bits).view(np.float32)
    nspb = np.float32(np.float32(sample_rate) / data_rate_f)
    geom = {}
    for carrier in (0, 1):
        if carrier:
            try_max = int(np.trunc(np.float32(
                nspb * np.float32(0.75)) + np.float32(0.5))) + overscan
            try_first = overscan
        else:
            try_max = int(np.trunc(nspb)) + overscan
            try_first = 0
        coarse = max(try_max // FSK_ANALYZE_NSTEPS, 1)
        fine = max(try_max // FSK_ANALYZE_NSTEPS_FINE, 1)
        geom[carrier] = dict(
            try_max=try_max, coarse_step=coarse,
            coarse=_scan_order(try_first, try_max, coarse),
            fine=_scan_order(try_first, try_max, fine))
    return geom


@functools.lru_cache(maxsize=16)
def build_mega_rx(cfg_key, t_total: int, rx_one: bool, batch: int):
    """Compile the megakernel for a fixed packed-score length and batch.

    Consumes packed scores [B*8, t_total] uint32 (device_rx channel
    layout) and returns (ev [8, B, E] u32, n_events [B] i32,
    bytes_buf [B, E] u8, n_bytes [B] i32) — the compact-mode outputs of
    _build_device_rx.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (sample_rate, data_rate_bits, n_data_bits, nstartbits, nstopbits_bits,
     b_mark, b_space, fftsize, nb, magscalar_bits, bit_begin, n_bits,
     req_data, req_sync, use_f64, frame_nsamples, overscan,
     expect_nsamples, msb_first, do_rx_sync, sync_byte) = cfg_key

    nstop_shift = 0 if np.uint32(nstopbits_bits).view(np.float32) == 0 else 1
    assert n_data_bits <= 8

    geom = _static_geom(cfg_key)
    w_scan = max(geom[0]["try_max"], geom[1]["try_max"])
    # fetch block: dynamic pos is 128-aligned down, so the window spans at
    # most (128 - 1) + w_scan lanes
    w_fetch = ((w_scan + W_LANES - 1) // W_LANES + 1) * W_LANES

    K = max(len(g[k]) for g in geom.values() for k in ("coarse", "fine"))
    cand_np = np.full((2, 2, K), -1, np.int32)
    for c in (0, 1):
        cand_np[c, 0, :len(geom[c]["coarse"])] = geom[c]["coarse"]
        cand_np[c, 1, :len(geom[c]["fine"])] = geom[c]["fine"]
    valid_np = cand_np >= 0

    # events only occur on decoded frames (advance >= frame_adv) or
    # carrier drops (>= 21 no-confidence scans apart) — NOT on every
    # no-confidence advance, so the VMEM event buffer stays small
    frame_adv = max(1, frame_nsamples - overscan)
    drop_adv = max(1, (FSK_MAX_NOCONFIDENCE_BITS + 1)
                   * min(geom[0]["try_max"], geom[1]["try_max"]))
    max_events = t_total // frame_adv + t_total // drop_adv + 16
    # event buffer rows must be sublane-aligned
    e_pad = ((max_events + 7) // 8) * 8

    inf = np.float32(np.inf)
    sync_ok = do_rx_sync and 0 <= sync_byte < (1 << n_data_bits)
    # candidate tables as kernel inputs (pallas kernels cannot capture
    # array constants); row = carrier*2 + fine
    cand_in = np.full((4, K), -1, np.int32)
    valid_in = np.zeros((4, K), np.int32)
    for c in (0, 1):
        for f in (0, 1):
            cand_in[c * 2 + f] = cand_np[c, f]
            valid_in[c * 2 + f] = valid_np[c, f].astype(np.int32)

    def kernel(total_ref, thr_ref, cand_ref, valid_ref, packed_hbm,
               ev_ref, nev_ref, bytes_ref, nbytes_ref,
               win_vmem, ev_vmem, bytes_vmem, sem):
        b = pl.program_id(0)
        total = total_ref[b]
        conf_threshold = thr_ref[0]
        conf_search_limit = thr_ref[1]
        lane_iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, w_fetch), 1)               # [1, W_FETCH]

        def fetch_window(pos):
            """DMA [8, W_FETCH] at 128-aligned base; return base offset."""
            base = (pos // W_LANES) * W_LANES
            dma = pltpu.make_async_copy(
                packed_hbm.at[pl.ds(b * 8, 8), pl.ds(base, w_fetch)],
                win_vmem, sem)
            dma.start()
            dma.wait()
            return pos - base                          # in [0, 128)

        def find_frame(off, carrier_i, expect_i, fine_i, limit):
            """Vectorized replay of the center-out scan over the fetched
            window.  off = pos - base (lane offset of candidate 0)."""
            clist = jnp.where(carrier_i == 1,
                              cand_ref[2 + fine_i, :],
                              cand_ref[fine_i, :])                  # [K]
            vmask = jnp.where(carrier_i == 1,
                              valid_ref[2 + fine_i, :],
                              valid_ref[fine_i, :]) != 0
            lanes = off + jnp.maximum(clist, 0)                     # [K]
            # candidate one-hots [K, W_FETCH]
            oh = lane_iota == lanes[:, None]
            cd = jax.lax.bitcast_convert_type(win_vmem[0, :], jnp.float32)
            cs = jax.lax.bitcast_convert_type(win_vmem[1, :], jnp.float32)
            ce = jnp.where(expect_i == 0, cd, cs)                   # [W]
            c = jnp.sum(jnp.where(oh, ce[None, :], 0.0), axis=1,
                        dtype=jnp.float32)                          # [K]
            c = jnp.where(jnp.logical_or(~vmask, jnp.isnan(c)),
                          jnp.float32(-1.0), c)
            # prefix-max / first-occurrence via a lower-triangular mask
            # (associative_scan/cumsum slice odd-length 1-D vectors, which
            # mosaic rejects; K^2 dense 2-D ops are trivial at K ~ 10-25)
            row_i = jax.lax.broadcasted_iota(jnp.int32, (K, K), 0)
            col_j = jax.lax.broadcasted_iota(jnp.int32, (K, K), 1)
            tri = col_j <= row_i                                  # j <= k
            neg_inf = jnp.float32(-np.inf)
            pos_inf = jnp.float32(np.inf)
            prefix = jnp.max(
                jnp.where(tri, c[None, :], neg_inf), axis=1
            ).astype(jnp.float32)
            crossed = prefix >= limit
            # the prefix-max at the FIRST crossing is the smallest prefix
            # value among crossed positions (prefix is nondecreasing)
            best_c = jnp.where(
                jnp.any(crossed),
                jnp.min(jnp.where(crossed, prefix, pos_inf)),
                jnp.max(c)).astype(jnp.float32)
            selhot = c == best_c
            sel_count = jnp.sum(
                (tri & selhot[None, :]).astype(jnp.int32),
                axis=1, dtype=jnp.int32)                          # [K]
            first = (sel_count == 1) & selhot
            got = best_c > 0.0
            t = jnp.sum(jnp.where(first, clist, 0), dtype=jnp.int32)
            # bool-typed reductions trip mosaic ("unsupported bitwidth
            # truncation"); sum in int32
            poshot = jnp.sum((first[:, None] & oh).astype(jnp.int32),
                             axis=0, dtype=jnp.int32) > 0           # [W]
            ae = jnp.where(expect_i == 0,
                           jax.lax.bitcast_convert_type(win_vmem[2, :],
                                                        jnp.float32),
                           jax.lax.bitcast_convert_type(win_vmem[3, :],
                                                        jnp.float32))
            a = jnp.sum(jnp.where(poshot, ae, 0.0), dtype=jnp.float32)
            # mosaic has no unsigned reductions: pick via a bit-preserving
            # int32 sum (exactly one hot position)
            blo = jnp.sum(
                jnp.where(poshot,
                          jax.lax.bitcast_convert_type(win_vmem[4, :],
                                                       jnp.int32),
                          jnp.int32(0)), dtype=jnp.int32)
            zf = jnp.float32(0.0)
            return (jnp.where(got, best_c, zf), jnp.where(got, a, zf),
                    jnp.where(got, blo, jnp.int32(0)),
                    jnp.where(got, t, jnp.int32(0)))

        def store_event(i, reci8, recf8):
            # scalar bitcasts are not lowerable; blend an i32 lane vector
            # with an f32 lane vector through VECTOR bitcasts (lanes 1,2 =
            # conf_total/ampl_total floats)
            li = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
            f32_lane = jnp.logical_or(li == 1, li == 2)
            rec = jnp.where(
                f32_lane,
                jax.lax.bitcast_convert_type(recf8.reshape(1, 8),
                                             jnp.uint32),
                jax.lax.bitcast_convert_type(reci8.reshape(1, 8),
                                             jnp.uint32))
            ev_vmem[pl.ds(i, 1), :] = rec

        # ---------------- state machine ----------------
        def cond(st):
            (pos, carrier_f, noconf, track, peak, conf_tot, ampl_tot,
             nframes, carrier_ns, n_ev, n_by, stop_f) = st
            return jnp.logical_and(
                stop_f == 0,
                jnp.logical_and(pos + expect_nsamples <= total,
                                n_ev < max_events - 2))

        def body(st):
            (pos, carrier_f, noconf, track, peak, conf_tot, ampl_tot,
             nframes, carrier_ns, n_ev, n_by, stop_f) = st
            carrier = carrier_f != 0
            carrier_i = carrier_f
            expect_i = 1 - carrier_i
            try_step = jnp.where(carrier_i == 1,
                                 geom[1]["coarse_step"],
                                 geom[0]["coarse_step"])
            try_max = jnp.where(carrier_i == 1,
                                geom[1]["try_max"], geom[0]["try_max"])

            off = fetch_window(pos)
            conf, ampl, blo, fstart = find_frame(
                off, carrier_i, expect_i, 0, conf_search_limit)

            refine = conf < peak * 0.75
            peak = jnp.where(refine, jnp.float32(0.0), peak)
            conf = jnp.where(ampl < track * 0.25, jnp.float32(0.0), conf)

            no_conf = conf <= conf_threshold
            got = jnp.logical_not(no_conf)
            noconf = jnp.where(no_conf, noconf + 1, jnp.int32(0))
            drop = jnp.logical_and(no_conf,
                                   noconf > FSK_MAX_NOCONFIDENCE_BITS)
            drop_report = jnp.logical_and(drop, carrier)

            acquired = jnp.logical_and(got, jnp.logical_not(carrier))
            do_refine = jnp.logical_or(refine, acquired)
            fstart_coarse = fstart
            do_fine = jnp.logical_and(
                got, jnp.logical_and(
                    do_refine,
                    jnp.logical_and(conf < inf, try_step > 1)))
            c2, a2, blo2, fs2 = find_frame(off, carrier_i, 0, 1, inf)
            take2 = jnp.logical_and(do_fine, c2 > conf)
            ampl = jnp.where(take2, a2, ampl)
            blo = jnp.where(take2, blo2, blo)
            fstart = jnp.where(take2, fs2, fstart)

            carrier_ns = carrier_ns + jnp.where(
                got,
                jnp.int32(frame_nsamples)
                + jnp.where(carrier, fstart_coarse - overscan, 0), 0)
            track = jnp.where(got, (track + ampl) / 2.0, track)
            peak = jnp.where(jnp.logical_and(got, peak < conf), conf, peak)
            conf_tot = jnp.where(got, conf_tot + conf, conf_tot)
            ampl_tot = jnp.where(got, ampl_tot + ampl, ampl_tot)
            nframes = jnp.where(got, nframes + 1, nframes)
            advance = jnp.where(
                got, fstart + jnp.int32(frame_nsamples) - overscan, try_max)

            # control events
            zi32 = jnp.int32(0)
            zf32 = jnp.float32(0.0)

            @pl.when(drop_report)
            def _():
                reci = jnp.stack([
                    nframes, zi32, zi32, carrier_ns, n_by, zi32,
                    jnp.int32(EV_NOCARRIER), zi32])
                recf = jnp.stack([
                    zf32, conf_tot, ampl_tot, zf32, zf32, zf32, zf32, zf32])
                store_event(n_ev, reci, recf)

            @pl.when(acquired)
            def _():
                reci = jnp.stack([
                    n_by, zi32, zi32, zi32, zi32, zi32,
                    jnp.int32(EV_CARRIER), zi32])
                recf = jnp.stack([zf32] * 8)
                store_event(n_ev, reci, recf)

            n_ev = n_ev + jnp.where(
                jnp.logical_or(drop_report, acquired), 1, 0)

            # data byte (blo carries the frame bits, bit-preserving i32)
            word = jax.lax.shift_right_logical(
                blo, jnp.int32(nstop_shift + nstartbits)) \
                & jnp.int32((1 << n_data_bits) - 1)
            if msb_first:
                rev = jnp.int32(0)
                for k in range(n_data_bits):
                    rev = rev | (((word >> jnp.int32(k)) & jnp.int32(1))
                                 << jnp.int32(n_data_bits - 1 - k))
                word = rev
            emit_byte = got
            if sync_ok:
                emit_byte = jnp.logical_and(
                    got, word != jnp.int32(sync_byte))

            @pl.when(emit_byte)
            def _():
                bytes_vmem[pl.ds(n_by, 1), :] = word[None, None]

            n_by = n_by + jnp.where(emit_byte, 1, 0)

            pos = pos + advance
            new_carrier = jnp.where(got, jnp.int32(1),
                                    jnp.where(drop, jnp.int32(0),
                                              carrier_f))
            reset = drop_report
            track = jnp.where(reset, jnp.float32(0.0), track)
            conf_tot = jnp.where(reset, jnp.float32(0.0), conf_tot)
            ampl_tot = jnp.where(reset, jnp.float32(0.0), ampl_tot)
            nframes = jnp.where(reset, jnp.int32(0), nframes)
            carrier_ns = jnp.where(reset, jnp.int32(0), carrier_ns)
            if rx_one:
                stop_f = jnp.where(drop_report, jnp.int32(1), stop_f)
            return (pos, new_carrier, noconf, track, peak, conf_tot,
                    ampl_tot, nframes, carrier_ns, n_ev, n_by, stop_f)

        zf = jnp.float32(0.0)
        zi = jnp.int32(0)
        st = jax.lax.while_loop(
            cond, body,
            (zi, zi, zi, zf, zf, zf, zf, zi, zi, zi, zi, zi))
        (pos, carrier_f, noconf, track, peak, conf_tot, ampl_tot,
         nframes, carrier_ns, n_ev, n_by, stop_f) = st
        carrier = carrier_f != 0

        @pl.when(carrier)
        def _():
            zi32 = jnp.int32(0)
            zf32 = jnp.float32(0.0)
            reci = jnp.stack([
                nframes, zi32, zi32, carrier_ns, n_by, zi32,
                jnp.int32(EV_NOCARRIER), zi32])
            recf = jnp.stack([
                zf32, conf_tot, ampl_tot, zf32, zf32, zf32, zf32, zf32])
            store_event(n_ev, reci, recf)

        n_ev_final = n_ev + jnp.where(carrier, 1, 0)

        # flush VMEM accumulators to the outputs ([E,8] -> [1,8,E] etc)
        ev_ref[...] = ev_vmem[...].T[None]
        bytes_ref[...] = bytes_vmem[...].reshape(1, 1, e_pad)
        nev_ref[b] = n_ev_final
        nbytes_ref[b] = n_by

    grid = (batch,)
    fn = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),       # total [B]
            pl.BlockSpec(memory_space=pltpu.SMEM),       # thresholds [2]
            pl.BlockSpec(memory_space=pltpu.VMEM),       # candidates [4,K]
            pl.BlockSpec(memory_space=pltpu.VMEM),       # valid mask [4,K]
            pl.BlockSpec(memory_space=pltpu.ANY),        # packed scores HBM
        ],
        out_specs=(
            pl.BlockSpec((1, 8, e_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # events
            pl.BlockSpec(memory_space=pltpu.SMEM),       # n_events [B]
            pl.BlockSpec((1, 1, e_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),       # bytes (u32)
            pl.BlockSpec(memory_space=pltpu.SMEM),       # n_bytes [B]
        ),
        out_shape=(
            jax.ShapeDtypeStruct((batch, 8, e_pad), jnp.uint32),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1, e_pad), jnp.int32),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((8, w_fetch), jnp.uint32),
            pltpu.VMEM((e_pad, 8), jnp.uint32),
            pltpu.VMEM((e_pad, 1), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    def wrapper(packed, totals, thr2):
        with jax.enable_x64(False):
            ev, nev, byt, nby = fn(
                totals, thr2, jnp.asarray(cand_in), jnp.asarray(valid_in),
                packed)
        return ev, nev, byt, nby

    return jax.jit(wrapper), max_events, e_pad


class MegaReceiver:
    """Batched one-shot receiver on the Pallas megakernel.  Produces the
    same per-stream (ev_type, ev_pay, byte_stream) tuples as the compact
    DeviceReceiver; tests assert event-for-event equality."""

    def __init__(self, cfg, precision: str = "auto", rx_one: bool = False):
        from .device_rx import device_rx_key

        from .device_rx import geo_from_key

        self.cfg = cfg
        self.key = device_rx_key(cfg, precision)
        assert not geo_from_key(self.key).use_f64, (
            "mega receiver is float32-only; use DeviceReceiver for "
            "perfect-capable (float64) geometries")
        self.rx_one = rx_one
        self._fns = {}

    def _fn_for(self, t_total: int, batch: int, input_dtype: str):
        import jax
        import jax.numpy as jnp

        from .device_rx import make_score_packer

        k = (t_total, batch, input_dtype)
        cached = self._fns.get(k)
        if cached is not None:
            return cached
        packer = make_score_packer(self.key, t_total, input_dtype)
        kern, max_events, e_pad = build_mega_rx(
            self.key, t_total, self.rx_one, batch)

        def run(x, totals, thr2):
            packed = jax.vmap(packer)(x).reshape(batch * 8, t_total)
            return kern(packed, totals, thr2)

        cached = (jax.jit(run), max_events)
        self._fns[k] = cached
        return cached

    def run_events_batch(self, samples: np.ndarray, totals,
                         conf_threshold: float, conf_search_limit: float):
        import jax.numpy as jnp

        from .device_rx import (
            _round_up_pow2,
            geometry_from_config,
            unpack_events,
        )

        b, L = samples.shape
        totals = np.asarray(totals, np.int32)
        t_total = _round_up_pow2(
            int(totals.max(initial=0)) + self.cfg.nsamples_overscan + 1)
        geo = geometry_from_config(self.cfg)
        in_dtype = "int16" if samples.dtype == np.int16 else "float32"
        fn, max_events = self._fn_for(t_total, b, in_dtype)
        x = np.zeros((b, t_total + geo.halo), samples.dtype)
        x[:, :min(L, t_total + geo.halo)] = samples[:, :t_total + geo.halo]
        thr2 = np.asarray([conf_threshold, conf_search_limit], np.float32)
        import jax
        with jax.enable_x64(False):
            ev, nev, byt, nby = fn(jnp.asarray(x), jnp.asarray(totals),
                                   jnp.asarray(thr2))
        nev = np.asarray(nev)
        nby = np.asarray(nby)
        kmax = max(int(nev.max(initial=0)), 1)
        bmax = max(int(nby.max(initial=0)), 1)
        ev = np.asarray(ev[:, :, :kmax])              # [B, 8, kmax]
        byt = np.asarray(byt[:, 0, :bmax]).astype(np.uint8)
        return [
            (*unpack_events(ev[i], int(nev[i])), byt[i, :int(nby[i])])
            for i in range(b)
        ]
