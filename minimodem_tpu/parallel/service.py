"""Multi-chip decode service: the FULL receiver sharded over a device mesh.

parallel/sharding.py shards the scoring stage (dp x sp with a ppermute
halo exchange); this module shards the COMPLETE decode — scoring,
carrier state machine (XLA while_loop), event collection — over a
(dp, sp) mesh via shard_map, with psum'd fleet statistics.  Streams
are independent (the reference's RX loop, src/minimodem.c:1144-1463,
has no cross-stream state), so dp needs no communication.  With sp>1
the time axis of scoring is also sharded: each shard scores t_total/sp
offsets (ppermute halo from the right neighbor), the packed score
channels are all-gathered along "sp" over ICI, and the sequential
state machine runs sp-replicated on the gathered scores — scoring
carries ~99% of the FLOPs, so replicating the state machine trades a
negligible amount of compute for zero cross-shard control flow.

This is the deployment shape for a decode fleet: N chips x B/N streams
each, one program launch, one result collection, aggregate service
stats computed on-mesh instead of post-hoc on host.

The reference has no distributed layer at all (SURVEY.md section 2:
"Parallelism / distributed components — explicitly: NONE"); this is
TPU-native headroom, not parity.
"""

from __future__ import annotations

import io
from typing import Optional

import numpy as np

from ..config import ModemConfig
from .sharding import make_mesh


def _collect_compact_blocks(flat_dev, ev_dev, dp: int, b_pad: int,
                            b: int):
    """Unpack per-dp-shard compact result blocks (pack_compact_results
    layout, one block per shard — streams d*Bl..(d+1)*Bl-1 live in
    block d): one bulk transfer of the flat vectors, lazy event-log
    slices for the rare >EV_CAP overflow."""
    from ..ops.device_rx import _collect_compact

    bl = b_pad // dp
    flat_np = np.ascontiguousarray(np.asarray(flat_dev)).reshape(dp, -1)
    events = []
    for d in range(dp):
        events.extend(_collect_compact(
            (flat_np[d], ev_dev[:, d * bl:(d + 1) * bl, :]), bl))
    return events[:b]


class ShardedReceiver:
    """dp-sharded batched decode over a jax Mesh.

    run_events_batch mirrors ops.device_rx.DeviceReceiver's API and
    event format; decode_batch renders events to bytes per stream.
    Fleet stats (total frames decoded, total events, mean confidence
    over carrier frames) are reduced on-mesh with psum.
    """

    def __init__(self, cfg: ModemConfig, mesh=None,
                 precision: str = "auto", rx_one: bool = False,
                 compact: str = "auto"):
        import jax

        from ..ops.device_rx import device_rx_key

        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            dp=len(jax.devices()), sp=1)
        self.dp = self.mesh.shape["dp"]
        self.sp = self.mesh.shape.get("sp", 1)
        self.precision = precision
        self.rx_one = rx_one
        self.key = device_rx_key(cfg, precision)
        # the production receiver path: byte-sized words post-process to
        # a ~1-byte-per-frame stream ON DEVICE (like DeviceReceiver),
        # so the fleet's result collection moves ~1 B/frame instead of
        # the ~32 B/frame wide event log
        if compact == "auto":
            self.compact = cfg.n_data_bits <= 8
        else:
            self.compact = bool(compact)
        # dp-only fleet ingest rides the SAME megakernel program the
        # single-chip samples receiver dispatches (ops/device_rx.py's
        # DeviceReceiver): one-shot decodes, zero carry per stream.
        # sp>1 keeps the XLA while_loop (the gathered-planes layout
        # feeds _build_device_rx's packed_input path).
        from ..ops.pallas_rx import mega_default_on, mega_supported

        self.use_mega = (self.sp == 1 and self.compact
                         and mega_supported(self.key)
                         and mega_default_on())
        self._fns = {}

    def _fn_for(self, t_total: int, in_dtype: str, batch_local: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from ..ops.device_rx import _build_device_rx

        cache_key = (t_total, in_dtype,
                     batch_local if self.use_mega else 0)
        fn = self._fns.get(cache_key)
        if fn is not None:
            return fn
        sp = self.sp
        compact = self.compact
        use_mega = self.use_mega
        if use_mega:
            from ..ops.device_rx import make_score_packer_planes
            from ..ops.pallas_rx import build_mega_rx, mega_score_len

            from ..ops.device_rx import U8_ENCODINGS

            t_score = mega_score_len(self.key, t_total)
            pk_dtype = ("float32" if in_dtype in U8_ENCODINGS
                        else in_dtype)
            packer, n_ch_mega, _ = make_score_packer_planes(
                self.key, t_score, pk_dtype)
            kern, _, _ = build_mega_rx(self.key, t_total, self.rx_one,
                                       batch_local)
        else:
            # the [8, B, E] event layout (and compact mode's flat result
            # vector, blocked per dp shard) shards cleanly on the stream
            # axis
            rx_fn, _, _ = _build_device_rx(
                self.key, t_total, self.rx_one, in_dtype, True, compact,
                packed_input=(sp > 1))
        if sp > 1:
            # sp-sharded scoring: each (dp, sp) shard scores t_total/sp
            # offsets (halo ppermuted from the right neighbor, like
            # sharding.sharded_score_fn), then the packed channels are
            # all-gathered along "sp" and every sp rank runs the
            # dp-local state machine on identical inputs (replicated
            # compute — the state machine is sequential over time and
            # carries ~1% of the work; scoring is where the FLOPs are)
            from ..ops.device_rx import (
                U8_ENCODINGS, geo_from_key, make_score_packer)

            assert t_total % sp == 0, (t_total, sp)
            t_local = t_total // sp
            geo = geo_from_key(self.key)
            if geo.halo > t_local:
                raise ValueError(
                    f"halo ({geo.halo}) exceeds t_total/sp ({t_local}); "
                    "use fewer sp shards for this geometry")
            # u8 wires expand + tail-mask inside local_fn (expand_wire
            # with shard-absolute positions), so the packer sees float32
            pk_dtype = ("float32" if in_dtype in U8_ENCODINGS
                        else in_dtype)
            packer = make_score_packer(self.key, t_local, pk_dtype)
            halo = geo.halo
            # single-expect narrow geometries carry only 3 distinct
            # channels (conf_sync/ampl_sync alias the data rows, bits_hi
            # and rows 6/7 are zero — pallas_score.plane_rows): gather
            # those 3 over ICI and re-alias after, 2.7x less all_gather
            # volume; dual-expect (--sync-byte) / wide-bits keep all 8
            from ..ops.pallas_score import plane_rows

            slim = plane_rows(geo.n_bits, geo.req_data,
                              geo.req_sync)[0] == 4

        from ..ops.device_rx import PAD_BYTE, U8_ENCODINGS

        silence = (PAD_BYTE[in_dtype] if in_dtype in U8_ENCODINGS else 0)

        def local_fn(x, totals, thr, carry):
            # thr: [2] = (conf_threshold, conf_search_limit), replicated
            if sp > 1:
                # x: [Bl, t_local] time shard; fetch the right-neighbor
                # halo over ICI (last shard scores into silence padding,
                # matching the unsharded scorer's pad past t_total — for
                # u8 wire encodings that's the silence CODEWORD, not
                # byte 0, which would expand to DC)
                lead = x[:, :halo]
                left_halo = jax.lax.ppermute(
                    lead, "sp",
                    [(i, (i - 1) % sp) for i in range(sp)])
                is_last = jax.lax.axis_index("sp") == sp - 1
                left_halo = jnp.where(is_last,
                                      jnp.full_like(left_halo, silence),
                                      left_halo)
                x_ext = jnp.concatenate([x, left_halo], axis=1)
                if in_dtype in U8_ENCODINGS:
                    # expand + zero past each stream's total in
                    # shard-absolute positions (x_ext is contiguous:
                    # column j holds global sample rank*t_local + j),
                    # matching the float path's exact-zero fill — A-law
                    # has no zero codeword (ops/device_rx.expand_wire)
                    from ..ops.device_rx import normalize_input

                    rank = jax.lax.axis_index("sp")
                    idx = (rank * t_local
                           + jnp.arange(x_ext.shape[1]))[None, :]
                    v = normalize_input(x_ext, in_dtype)
                    x_ext = jnp.where(idx < totals[:, None], v,
                                      jnp.float32(0.0))
                packed_local = jax.vmap(packer)(x_ext)  # [Bl, 8, t_local]
                if slim:
                    sel = packed_local[:, (0, 2, 4), :]  # cd, ad, bits_lo
                    g = jax.lax.all_gather(sel, "sp", axis=2, tiled=True)
                    z = jnp.zeros_like(g[:, :1])
                    packed = jnp.concatenate(
                        [g[:, 0:1], g[:, 0:1], g[:, 1:2], g[:, 1:2],
                         g[:, 2:3], z, z, z], axis=1)
                else:
                    packed = jax.lax.all_gather(
                        packed_local, "sp", axis=2, tiled=True)
                out = rx_fn(packed, totals, thr[0], thr[1], carry)
            elif use_mega:
                # x: [Bl, t_score + halo] raw wire; expand u8 + tail-
                # mask exactly like _mega_run_fn, then the planes packer
                # feeds the megakernel (one-shot: zero carry)
                xm = x
                if in_dtype in U8_ENCODINGS:
                    from ..ops.device_rx import expand_wire

                    xm = expand_wire(xm, totals, in_dtype, 0)
                packed = jax.vmap(packer)(xm).reshape(
                    batch_local * n_ch_mega, t_score)
                ci = jnp.zeros((batch_local, 8), jnp.int32)
                cf = jnp.zeros((batch_local, 4), jnp.float32)
                out = kern(packed, totals, thr, ci, cf)[:2]
            else:
                out = rx_fn(x, totals, thr[0], thr[1], carry)
            if compact:
                # (flat, ev_full, carry): flat is the packed one-transfer
                # result vector (pack_compact_results layout, blocked per
                # shard); the full event log rides along for stats and
                # the rare >EV_CAP overflow fetch
                flat, ev = out[0], out[1]
                Bl = totals.shape[0]
                n = flat[:Bl].astype(jnp.int32)
            else:
                flat = None
                ev, n = out[0], out[1]
            # fleet stats, reduced over the mesh (EV codes:
            # ops/device_rx.py:49-52; NOCARRIER pay = [nframes,
            # conf_total, ampl_total, ...] — device_rx.py:654-663)
            from ..ops.device_rx import EV_NOCARRIER
            erange = jnp.arange(ev.shape[2])[None, :]
            live = erange < n[:, None]                      # [Bl, E]
            et = ev[6].view(jnp.int32)                      # [Bl, E]
            is_rep = live & (et == EV_NOCARRIER)
            nframes = jnp.where(is_rep, ev[0].view(jnp.int32), 0)
            conf_tot = jnp.where(is_rep, ev[1].view(jnp.float32), 0.0)
            stats = jnp.stack([
                jnp.sum(n).astype(jnp.float32),             # events
                jnp.sum(nframes).astype(jnp.float32),       # data frames
                jnp.sum(conf_tot),                          # conf sum
            ])
            stats = jax.lax.psum(stats, "dp")
            if compact:
                return flat, ev, stats
            return ev, n, stats

        x_spec = P("dp", "sp") if sp > 1 else P("dp")
        in_specs = (x_spec, P("dp"), P(), P("dp"))
        # carry dict: every leaf is per-stream [B]; results/stats are
        # sp-replicated (every sp rank ran the same state machine).
        # compact: flat result vectors concatenate per dp shard.
        out_specs = ((P("dp"), P(None, "dp"), P()) if compact
                     else (P(None, "dp"), P("dp"), P()))
        if hasattr(jax, "shard_map"):  # jax >= 0.8
            sfn = jax.shard_map(
                local_fn, mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs, check_vma=False)
        else:
            from jax.experimental.shard_map import shard_map

            sfn = shard_map(
                local_fn, mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs, check_rep=False)
        if use_mega:
            from ..utils.aot import jit_mosaic

            fn = jit_mosaic(sfn)
        else:
            fn = jax.jit(sfn)
        self._fns[cache_key] = fn
        return fn

    def run_events_batch(self, samples: np.ndarray, totals,
                         conf_threshold: float = 1.5,
                         conf_search_limit: float = 2.3,
                         in_encoding: str = None):
        """samples: [B, L] (int16, float32, or uint8 with in_encoding in
        U8_ENCODINGS — telephony bytes expand on each chip); totals: [B]
        valid lengths.  B is padded up to a multiple of the dp axis;
        padded rows decode silence and are dropped.  Returns (events,
        stats) — events like DeviceReceiver's (per-stream tuples), stats
        a dict of fleet aggregates."""
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        import jax

        from ..ops.device_rx import (
            _collect_results,
            _round_up_pow2,
            alloc_wire,
            geometry_from_config,
            wire_dtype,
            zero_carry,
        )

        b, L = samples.shape
        totals = np.asarray(totals, np.int32)
        b_pad = -(-b // self.dp) * self.dp
        need = int(totals.max(initial=0)) + self.cfg.nsamples_overscan + 1
        if self.sp > 1:
            # each sp shard's t_local must itself be a valid packer
            # length (pow2 / 256K-multiple bucketing)
            t_total = self.sp * _round_up_pow2(-(-need // self.sp))
        else:
            t_total = _round_up_pow2(need)
        geo = geometry_from_config(self.cfg, self.precision)
        # sp>1 shards the time axis evenly: no trailing halo region (the
        # last shard scores into zeros, which is what the region holds
        # anyway — t_total exceeds every stream's valid length)
        if self.sp > 1:
            t_host = t_total
        elif self.use_mega:
            # the planes packer scores mega_score_len extra zero tiles
            # (kernel refill slack) — hosts feed t_score + halo
            from ..ops.pallas_rx import mega_score_len

            t_host = mega_score_len(self.key, t_total) + geo.halo
        else:
            t_host = t_total + geo.halo
        x = alloc_wire((b_pad, t_host), samples.dtype, in_encoding)
        x[:b, :min(L, t_host)] = samples[:, :t_host]
        tot = np.zeros((b_pad,), np.int32)
        tot[:b] = totals
        in_dtype = wire_dtype(samples, in_encoding)
        fn = self._fn_for(t_total, in_dtype, b_pad // self.dp)

        shard = NamedSharding(self.mesh, P("dp"))
        x_shard = NamedSharding(
            self.mesh, P("dp", "sp") if self.sp > 1 else P("dp"))
        xs = jax.device_put(x, x_shard)
        r0, r1, stats = fn(
            xs, jax.device_put(tot, shard),
            np.asarray([conf_threshold, conf_search_limit], np.float32),
            jax.device_put(zero_carry(b_pad), shard))
        if self.compact:
            # flat result vectors are blocked per dp shard (streams
            # d*Bl..(d+1)*Bl-1 live in block d); one bulk transfer,
            # then the per-shard unpack of _collect_compact
            events = self.collect_compact_blocks(r0, r1, b_pad, b)
        else:
            events = _collect_results((r0, r1), b_pad, False)[:b]
        s = np.asarray(stats)
        nframes = float(s[1])
        return events, {
            "devices": self.dp,
            "events_total": int(s[0]),
            "frames_total": int(nframes),
            "mean_confidence": float(s[2] / nframes) if nframes else 0.0,
        }

    def collect_compact_blocks(self, flat_dev, ev_dev, b_pad: int, b: int):
        return _collect_compact_blocks(flat_dev, ev_dev, self.dp,
                                       b_pad, b)

    def decode_batch(self, streams, conf_threshold: float = 1.5,
                     conf_search_limit: float = 2.3,
                     codec: str = None):
        """Decode a list of 1-D sample arrays -> (list of bytes, stats).
        codec: databits codec name (codecs.get_codec); defaults to ascii
        for byte-sized words, raw bit lines otherwise."""
        from ..codecs import get_codec
        from ..config import RxOptions
        from ..rx.engine import Receiver

        b = len(streams)
        L = max((len(s) for s in streams), default=0)
        dtype = streams[0].dtype if b else np.float32
        x = np.zeros((b, L), dtype)
        for i, s in enumerate(streams):
            x[i, :len(s)] = s
        events, stats = self.run_events_batch(
            x, [len(s) for s in streams], conf_threshold,
            conf_search_limit)
        # Ascii8Codec handles any word <= 8 bits (7-bit ascii included);
        # 5-bit words are Baudot in every shipped mode (rtty/tdd)
        if codec is None:
            codec = ("baudot" if self.cfg.n_data_bits == 5 else
                     "ascii8" if self.cfg.n_data_bits <= 8 else "binary")
        decoder = codec
        outs = []
        for ev in events:
            sink = io.BytesIO()
            rxer = Receiver(
                self.cfg,
                RxOptions(confidence_threshold=conf_threshold,
                          confidence_search_limit=conf_search_limit,
                          quiet=True),
                get_codec(decoder), sink.write, lambda _line: None)
            rxer.render_events(*ev)
            outs.append(sink.getvalue())
        return outs, stats


class ShardedLoopback:
    """dp-sharded DeviceLoopback: B bit schedules synthesize AND decode
    across an N-chip mesh, B/N streams per chip, with each shard running
    the EXACT single-chip production program (DeviceLoopback.build_loop
    — megakernel where eligible, compact byte streams) so fleet decode
    runs at single-chip speed per chip.  Results collect via the same
    one-transfer compact blocks as ShardedReceiver.

    This is the serving-fleet configuration of the reference's RX loop
    (src/minimodem.c:1137-1463) with on-device TX (the bench shape);
    parity is pinned against DeviceLoopback on the virtual mesh
    (tests/test_service.py)."""

    def __init__(self, cfg: ModemConfig, mesh=None,
                 precision: str = "auto", amplitude: float = 1.0,
                 rx_one: bool = False):
        import jax

        from ..ops.device_rx import DeviceLoopback

        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(
            dp=len(jax.devices()), sp=1)
        self.dp = self.mesh.shape["dp"]
        if self.mesh.shape.get("sp", 1) != 1:
            raise ValueError("ShardedLoopback shards streams only (dp)")
        self.lb = DeviceLoopback(cfg, precision, amplitude, rx_one)
        self._fns = {}

    def _fn_for(self, b_pad: int, batch_local: int):
        import jax
        from jax.sharding import PartitionSpec as P

        cache_key = (b_pad, batch_local)
        hit = self._fns.get(cache_key)
        if hit is not None:
            return hit
        run, compact, use_mega = self.lb.build_loop(b_pad, batch_local)

        in_specs = (P("dp"), P("dp"), P(), P(), P("dp"))
        # compact: (flat [L], ev [8, Bl, E]); wide: (ev, n)
        out_specs = ((P("dp"), P(None, "dp")) if compact
                     else (P(None, "dp"), P("dp")))
        if hasattr(jax, "shard_map"):  # jax >= 0.8
            sfn = jax.shard_map(run, mesh=self.mesh, in_specs=in_specs,
                                out_specs=out_specs, check_vma=False)
        else:
            from jax.experimental.shard_map import shard_map

            sfn = shard_map(run, mesh=self.mesh, in_specs=in_specs,
                            out_specs=out_specs, check_rep=False)
        if use_mega:
            from ..utils.aot import jit_mosaic

            fn = jit_mosaic(sfn)
        else:
            fn = jax.jit(sfn)
        self._fns[cache_key] = (fn, compact, use_mega)
        return fn, compact, use_mega

    def run_events_batch(self, sched_list, conf_threshold: float = 1.5,
                         conf_search_limit: float = 2.3):
        """sched_list: list of uint8 bit schedules (one per stream); the
        list is padded up to a multiple of dp with empty streams, which
        decode silence and are dropped.  Returns per-stream event tuples
        exactly like DeviceLoopback.run_events_batch."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.device_rx import zero_carry

        assert self.lb.uniform, (
            "flat bit schedules need uniform bit segments")
        from ..ops.device_rx import _sched_pad

        b = len(sched_list)
        b_pad_streams = -(-b // self.dp) * self.dp
        b_real = [len(s) for s in sched_list] + [0] * (b_pad_streams - b)
        b_pad = _sched_pad(max(b_real))
        bits = np.zeros((b_pad_streams, b_pad), np.uint8)
        for i, s in enumerate(sched_list):
            bits[i, :len(s)] = s
        bits_pk = np.packbits(bits, axis=1, bitorder="little")
        totals = np.asarray(
            [n * self.lb.bit_ns for n in b_real], np.int32)
        batch_local = b_pad_streams // self.dp
        fn, compact, use_mega = self._fn_for(b_pad, batch_local)

        shard = NamedSharding(self.mesh, P("dp"))
        out = fn(
            jax.device_put(jnp.asarray(bits_pk), shard),
            jax.device_put(jnp.asarray(totals), shard),
            np.float32(conf_threshold), np.float32(conf_search_limit),
            jax.device_put(zero_carry(b_pad_streams), shard))
        if compact:
            return _collect_compact_blocks(out[0], out[1], self.dp,
                                           b_pad_streams, b)
        from ..ops.device_rx import _collect_results

        return _collect_results(out, b_pad_streams, False)[:b]
