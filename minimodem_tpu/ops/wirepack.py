"""Lossless delta-bitpack wire transport for int16 sample uploads.

The host<->device link in this harness is a ~10-40 MB/s tunnel
(CLAUDE.md), so the e2e PCM16 decode path is upload-bound: 48 kHz
int16 is 96 KB of wire per audio-second while the decode itself runs
thousands of times faster than the link can feed it.  FSK audio is
highly compressible with integer linear prediction: the order-k
finite difference of a sampled tone of angular frequency w shrinks by
~(2 sin(w/2))^k per order.  Bit transitions locally spike the deltas,
which a per-block width would absorb — but TPU gathers run at only
~50k elements/ms (measured), so any variable-stride layout loses its
wire savings to device-side placement cost.  The format is therefore
fully STATIC-stride:

  - every delta packs at one global even width w (dense reshape +
    static shifts decode — no gathers), and
  - the sparse transition spikes (|delta| >= 2^(w-1)) ride a
    fixed-capacity exception list applied with ONE small scatter.

Measured on the Bell-202 bench signal: (k=4, w=10) leaves 4.8%
exceptions and a 0.75x wire (11.5 bits/sample raw-equivalent), vs
0.875x for the best exception-free global width.

STATUS — opt-in, not default (measured negative on this harness's
tunnel): the e2e A/B on 120 s of PCM16 recorded raw 637x vs packed
405x real-time.  The tunnel sustains ~60 MB/s while the host pack
runs ~62 MB/s, so even fully overlapped on the put-ahead worker the
pack+put thread paces the pipeline and the ~19% wire saving cannot
pay; break-even needs a link under ~25 MB/s.  Engage explicitly with
wire_pack=True or MINIMODEM_TPU_WIREPACK=1 (see default_on).

The payload layout is PLANE-MAJOR so the device decode touches only
contiguous long-minor-axis slices: XLA's TPU tiling pads a small
minor dim (e.g. [B, groups, 5] bytes-of-group) to the (8, 128) tile,
inflating memory 16-32x and sinking the decode (measured: the
group-interleaved v3 layout cost ~700 ms on the bench stream; planes
decode in milliseconds).  Deltas split into 8 strided lanes (lane j
holds body[j*G:(j+1)*G], G = ceil(n/8)); position g of the 8 lanes
packs into w/2 uint16 PLANES (plane h carries bits [16h, 16h+16) of
the 8w-bit group), each plane a contiguous G-element u16 run.  The
wire uploads as int16 (measured ~17% faster per byte than u8 on the
tunnel) and decodes with static shifts + one concat — no gathers, no
interleave, no bitcast.

Wire format (per stream row; all offsets static given the spec;
units of uint16):

  [ 32 x u16 header | w/2 base planes | exc pos plane | 2 exc val planes ]
  header:  12 x int32 LE (= 24 u16): seeds[0..5] (first k entries of
           the k-pass delta array), n_exc, 5 reserved/zero
  base:    plane h in [0, w/2): u16[G] holding bits [16h, 16h+16) of
           each position's 8-lane group; exception slots pack as 0
  exc pos: E_cap x uint16 position deltas (first is absolute);
           gaps > 65535 use dummy records repeating the previous
           entry; slots past n_exc repeat the last record
  exc val: E_cap x u16 low halves, then E_cap x u16 high halves of
           the int32 delta values

The spec (k, w, n_packed, E_cap) is static per compiled receiver
(spec_str token).  k first differences invert with k inclusive scans;
round-trip is bit-exact (all integer arithmetic), so decode decisions
are identical to the raw int16 wire.  choose_params falls back to the
raw wire (None) when packing would not pay.  The reference has no
analogue (it reads from a local soundcard/file,
src/simpleaudio-sndfile.c); this is TPU-serving transport
engineering, the ingest-side sibling of the raw-u8 G.711 wires.
"""

from __future__ import annotations

import numpy as np

HEADER_BYTES = 64
MAX_ORDER = 5
_WIDTHS = (4, 6, 8, 10, 12, 14)
_EXC_ALIGN = 1 << 14            # exception capacity bucket


def _native():
    """The native packer (wirepack.cpp), or None.  The NumPy packer
    below is the behavioral reference (byte-parity pinned by
    tests/test_wirepack.py); the C++ one exists because the pack must
    run far faster than the ~60 MB/s tunnel to pay for itself on the
    link-bound e2e path."""
    from ..native import load

    lib = load()
    return lib if lib is not None and hasattr(lib, "mm_wirepack_pack") \
        else None


def delta_encode(x: np.ndarray, k: int) -> np.ndarray:
    """k passes of first differences (each pass keeps element 0), int32.
    Inverse of k inclusive scans."""
    a = x.astype(np.int32)
    for _ in range(k):
        a = np.concatenate([a[:1], np.diff(a)])
    return a


def _size_bits(n: int, w: int, n_exc: int) -> float:
    return HEADER_BYTES * 8 + w * n + 48 * n_exc


def choose_params(x: np.ndarray, max_ratio: float = 0.92,
                  sample: bool = True):
    """Pick (k, w) minimizing base-width bits + 6-byte exception
    records for int16 samples x, or None when nothing beats max_ratio
    of the raw 16-bit wire.  With sample=True the choice runs on ~1M
    sampled samples ((k, w) only steer the RATIO — exceptions are
    always measured exactly at pack time — so a sampled choice is
    safe)."""
    if x.dtype != np.int16 or len(x) <= MAX_ORDER + 4:
        return None
    if sample and len(x) > 1 << 20:
        nwin = 16
        wlen = (1 << 20) // nwin
        step = (len(x) - wlen) // (nwin - 1)
        x = np.concatenate([x[i * step:i * step + wlen]
                            for i in range(nwin)])
    n = len(x)
    best = None                     # (bits, k, w)
    lib = _native()
    if lib is not None:
        import ctypes

        xs = np.ascontiguousarray(x)
        counts = np.zeros((MAX_ORDER + 1, len(_WIDTHS)), np.int64)
        lib.mm_wirepack_scan(
            xs.ctypes.data_as(ctypes.c_void_p), n, MAX_ORDER,
            counts.ctypes.data_as(ctypes.c_void_p))
        for k in range(MAX_ORDER + 1):
            for wi, w in enumerate(_WIDTHS):
                bits = _size_bits(n, w, int(counts[k, wi]))
                if best is None or bits < best[0]:
                    best = (bits, k, w)
    else:
        a = x.astype(np.int32)
        for k in range(MAX_ORDER + 1):
            if k:
                a = np.concatenate([a[:1], np.diff(a)])
            ab = np.abs(a[k:])
            for w in _WIDTHS:
                n_exc = int((ab >= (1 << (w - 1))).sum())
                bits = _size_bits(n, w, n_exc)
                if best is None or bits < best[0]:
                    best = (bits, k, w)
    if best is None or best[0] >= max_ratio * 16 * n:
        return None
    return best[1], best[2]


def _layout(n_packed: int, k: int, w: int, e_cap: int):
    """-> (G, base16, pos16, val16, row16): lane length and section
    offsets in UINT16 units (row bytes = 2 * row16, always even, so
    the wire uploads as an int16 view)."""
    G = max(1, -(-(n_packed - k) // 8))
    base = HEADER_BYTES // 2
    pos = base + G * (w // 2)
    val = pos + e_cap
    row = val + 2 * e_cap
    return G, base, pos, val, row


def count_exceptions(x: np.ndarray, k: int, w: int) -> int:
    """Exact exception count pack() will emit for samples x (incl.
    dummy records for >65535-sample gaps)."""
    lib = _native()
    if lib is not None and x.dtype == np.int16:
        import ctypes

        xs = np.ascontiguousarray(x)
        return int(lib.mm_wirepack_count(
            xs.ctypes.data_as(ctypes.c_void_p), len(xs), k, w))
    body = delta_encode(x, k)[k:]
    pos = np.nonzero(np.abs(body) >= (1 << (w - 1)))[0]
    return len(_with_dummies(pos, body)[0]) if len(pos) else 0


def _with_dummies(pos: np.ndarray, body: np.ndarray):
    """Insert dummy records (repeating a nearby in-range position) so
    every position delta fits uint16."""
    if not len(pos):
        return pos, np.zeros(0, np.int32)
    deltas = np.diff(pos, prepend=0)
    n_dum = np.maximum(0, (deltas - 1) // 65535)
    if n_dum.sum() == 0:
        return pos, body[pos]
    out_pos = []
    prev = 0
    for p, nd in zip(pos, n_dum):
        for j in range(int(nd)):
            out_pos.append(prev + 65535 * (j + 1))
        out_pos.append(int(p))
        prev = int(p)
    out_pos = np.asarray(out_pos, np.int64)
    return out_pos, body[out_pos]


def pack(x: np.ndarray, n_packed: int, k: int, w: int, e_cap: int,
         out: np.ndarray = None) -> np.ndarray:
    """Pack int16 samples (len(x) <= n_packed; the shortfall decodes
    as zero deltas, masked on device) into a u8 wire row.  Raises
    ValueError when the exceptions exceed e_cap (callers fall back to
    the raw wire).  Delegates to the native packer (wirepack.cpp,
    byte-identical — pinned by test_native_pack_byte_parity) when the
    library is available."""
    lib = _native()
    if lib is not None:
        import ctypes

        assert x.dtype == np.int16 and w % 2 == 0
        row_b = row_bytes(n_packed, k, w, e_cap)
        if out is None:
            out = np.empty(row_b, np.uint8)
        elif len(out) < row_b:
            raise ValueError(f"wire capacity {len(out)} < row {row_b}")
        xs = np.ascontiguousarray(x)
        rc = lib.mm_wirepack_pack(
            xs.ctypes.data_as(ctypes.c_void_p), len(xs), n_packed,
            k, w, e_cap, out.ctypes.data_as(ctypes.c_void_p), len(out))
        if rc == -1:
            raise ValueError(f"exceptions exceed capacity {e_cap}")
        if rc < 0:
            raise ValueError(f"native pack rejected args rc={rc}")
        return out
    return _pack_py(x, n_packed, k, w, e_cap, out)


def _pack_py(x: np.ndarray, n_packed: int, k: int, w: int, e_cap: int,
             out: np.ndarray = None) -> np.ndarray:
    """Pure-NumPy packer — the behavioral reference for wirepack.cpp."""
    assert x.dtype == np.int16 and w % 2 == 0
    d = delta_encode(x, k)
    body = d[k:]
    G, base16, pos16, val16, row16 = _layout(n_packed, k, w, e_cap)
    exc_pos = np.nonzero(np.abs(body) >= (1 << (w - 1)))[0]
    exc_pos, exc_val = _with_dummies(exc_pos, body)
    n_exc = len(exc_pos)
    if n_exc > e_cap:
        raise ValueError(f"{n_exc} exceptions > capacity {e_cap}")
    if out is None:
        out = np.zeros(2 * row16, np.uint8)
    elif len(out) < 2 * row16:
        raise ValueError(f"wire capacity {len(out)} < row {2 * row16}")
    o16 = out.view(np.uint16)
    hdr = np.zeros(12, np.int32)
    hdr[:k] = d[:k]
    hdr[6] = n_exc
    o16[:24] = hdr.view(np.uint16)
    # base payload: exception slots pack as 0 (overwritten on device)
    bb = body.copy()
    if n_exc:
        bb[exc_pos] = 0
    q = np.zeros(8 * G, np.int32)
    q[:len(bb)] = bb
    q = q.reshape(8, G)                     # lane j = body[j*G:(j+1)*G]
    mask = np.int32((1 << w) - 1)
    for h in range(w // 2):                 # plane h = bits [16h, 16h+16)
        acc = np.zeros(G, np.int32)
        for j in range(8):
            lo = j * w - 16 * h
            if lo >= 16 or lo + w <= 0:
                continue
            vj = q[j] & mask
            acc |= (vj << lo) if lo >= 0 else (vj >> -lo)
        o16[base16 + h * G:base16 + (h + 1) * G] = (
            acc & np.int32(0xFFFF)).astype(np.uint16)
    if n_exc:
        pd = np.diff(exc_pos, prepend=0).astype(np.uint16)
        o16[pos16:pos16 + n_exc] = pd
        v = exc_val.astype(np.int32)
        # pad slots are dropped on device via the header's n_exc
        o16[val16:val16 + n_exc] = (v & 0xFFFF).astype(np.uint16)
        o16[val16 + e_cap:val16 + e_cap + n_exc] = (
            (v >> 16) & 0xFFFF).astype(np.uint16)
    return out


def _cumsum_i32(v):
    """Exact int32 inclusive scan along the minor axis, two-level so the
    long axis never runs a multi-M-element serial scan."""
    import jax.numpy as jnp

    B, n = v.shape
    LANE = 512
    pad = (-n) % LANE
    if pad:
        v = jnp.pad(v, ((0, 0), (0, pad)))
    rows = v.reshape(B, -1, LANE)
    inner = jnp.cumsum(rows, axis=-1)
    offs = jnp.cumsum(inner[:, :, -1], axis=-1)
    offs = jnp.concatenate(
        [jnp.zeros((B, 1), v.dtype), offs[:, :-1]], axis=1)
    out = (inner + offs[:, :, None]).reshape(B, -1)
    return out[:, :n] if pad else out


def unpack_expand(wire, totals, k: int, w: int, n_packed: int,
                  e_cap: int, n_target: int, extra: int = 0):
    """Device-side inverse of pack: int16-framed wire [B, row16] ->
    float32 samples [B, n_target] normalized exactly like the int16
    wire (v / 32768), with positions >= totals+extra masked to exact
    0.0 (same parity rule as expand_wire for the raw-u8 G.711 wires).
    Fully dense except one e_cap-element scatter: every section is a
    contiguous long-minor [B, G]/[B, e_cap] slice (plane layout — see
    module docstring), the 8 lane decodes are static shifts, and
    reconstruction is k inclusive scans."""
    import jax
    import jax.numpy as jnp

    B = wire.shape[0]
    assert wire.dtype == jnp.int16, wire.dtype
    G, base16, pos16, val16, _ = _layout(n_packed, k, w, e_cap)

    def u16(sl):                                 # zero-extended halves
        return sl.astype(jnp.int32) & jnp.int32(0xFFFF)

    h16 = u16(wire[:, :24])                      # header as u16 pairs
    hdr = h16[:, 0::2] | (h16[:, 1::2] << 16)    # [B, 12] int32
    nh = w // 2
    p = [u16(wire[:, base16 + h * G:base16 + (h + 1) * G])
         for h in range(nh)]
    p.append(jnp.zeros((B, G), jnp.int32))
    mask = jnp.int32((1 << w) - 1)
    sign = jnp.int32(1 << (w - 1))
    cols = []
    for j in range(8):
        o, s = divmod(j * w, 16)                 # static per lane
        # s + w <= 29, so the low w bits survive the arithmetic shift
        v = ((p[o] | (p[o + 1] << 16)) >> s) & mask
        v = v - ((v & sign) << 1)                # sign-extend
        cols.append(v)
    body = jnp.concatenate(cols, axis=1)         # [B, 8G] natural order
    # exceptions: pos-delta cumsum -> absolute positions, one scatter;
    # slots past the header's n_exc point out of bounds and are dropped
    if e_cap:
        pd = u16(wire[:, pos16:pos16 + e_cap])
        pos = _cumsum_i32(pd)
        n_exc = hdr[:, 6]
        slot = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 1)
        pos = jnp.where(slot < n_exc[:, None], pos, jnp.int32(8 * G))
        lo = u16(wire[:, val16:val16 + e_cap])
        hi = wire[:, val16 + e_cap:val16 + 2 * e_cap].astype(jnp.int32)
        val = lo | (hi << 16)
        body = jax.vmap(
            lambda b, pp, v: b.at[pp].set(v, mode="drop"))(body, pos,
                                                           val)
    d = jnp.concatenate([hdr[:, :k], body], axis=1) if k else body
    if d.shape[1] >= n_target:
        d = d[:, :n_target]
    else:
        d = jnp.pad(d, ((0, 0), (0, n_target - d.shape[1])))
    for _ in range(k):
        d = _cumsum_i32(d)
    # identical expression to normalize_input("int16") — same rounding
    out = d.astype(jnp.float32) / jnp.float32(32768.0)
    posi = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    bound = totals + np.int32(extra) if extra else totals
    return jnp.where(posi < bound[:, None], out, jnp.float32(0.0))


def exc_capacity(n_exc: int) -> int:
    """Exception capacity bucket: headroom + alignment so segments of
    similar content share one executable."""
    return (-(-(n_exc + n_exc // 4 + 512) // _EXC_ALIGN) * _EXC_ALIGN)


def row_bytes(n_packed: int, k: int, w: int, e_cap: int) -> int:
    return 2 * _layout(n_packed, k, w, e_cap)[4]


def default_on() -> bool:
    """Whether "auto" wire packing engages: OFF unless
    MINIMODEM_TPU_WIREPACK=1/on.  Measured on the bench tunnel
    (120 s Bell-202 PCM16, put-ahead-2 pipeline): raw wire 637x
    real-time vs packed 405x — the tunnel moves ~60 MB/s while the
    host pack runs ~62 MB/s, so the worker thread (pack + put,
    serial) becomes the new bottleneck and the 19% wire saving
    cannot pay.  The format stays as an opt-in for deployments whose
    host link is genuinely slow (<~25 MB/s breaks even)."""
    import os

    return os.environ.get("MINIMODEM_TPU_WIREPACK", "") in ("1", "on")


def spec_str(k: int, w: int, n_packed: int, e_cap: int) -> str:
    """Wire-dtype token for the RX builder caches (all layout params)."""
    return f"dpack{k}w{w}n{n_packed}e{e_cap}"


def parse_spec(s: str):
    """-> (k, w, n_packed, e_cap) or None if s is not a dpack token."""
    if not (isinstance(s, str) and s.startswith("dpack")):
        return None
    body = s[5:]
    k, rest = body.split("w")
    w, rest = rest.split("n")
    n, e = rest.split("e")
    return int(k), int(w), int(n), int(e)
