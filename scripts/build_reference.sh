#!/bin/sh
# Build the reference minimodem binary for cross-decode interop tests.
#
# The image has no fftw3f or libsndfile dev packages, so this links the
# reference sources (read-only, under $REF) against:
#   - scripts/refbuild/fftw3f_shim.c : naive r2c DFT behind a minimal
#     fftw3.h (fsk.c uses five entry points)
#   - the real libsndfile .so bundled inside the pygame wheel, declared
#     by a minimal ABI-matching sndfile.h
#
# Output: $OUT/minimodem (default /tmp/minimodem-ref/minimodem), with an
# rpath into the pygame.libs dir so its hashed-name deps resolve.
# Nothing from $REF is copied into this repository.
set -e

REF=${REF:-/root/reference}
OUT=${OUT:-/tmp/minimodem-ref}
HERE=$(dirname "$(readlink -f "$0")")/refbuild

SNDLIB=$(ls /opt/venv/lib/python*/site-packages/pygame.libs/libsndfile* \
    2>/dev/null | head -1)
if [ -z "$SNDLIB" ]; then
    SNDLIB=$(python3 - <<'EOF'
import glob, site
for sp in site.getsitepackages():
    g = glob.glob(sp + "/pygame.libs/libsndfile*")
    if g:
        print(g[0]); break
EOF
)
fi
[ -n "$SNDLIB" ] || { echo "no bundled libsndfile found" >&2; exit 1; }
SNDDIR=$(dirname "$SNDLIB")

mkdir -p "$OUT"
cat > "$OUT/config.h" <<'EOF'
#define VERSION "24-ref-interop"
#define USE_SNDFILE 1
#define USE_ALSA 0
#define USE_PULSEAUDIO 0
#define USE_SNDIO 0
#define USE_BENCHMARKS 0
EOF

gcc -O2 -o "$OUT/minimodem" \
    -DHAVE_CONFIG_H -I"$OUT" -I"$HERE" \
    "$REF"/src/minimodem.c "$REF"/src/fsk.c \
    "$REF"/src/baudot.c "$REF"/src/uic_codes.c \
    "$REF"/src/databits_ascii.c "$REF"/src/databits_binary.c \
    "$REF"/src/databits_baudot.c "$REF"/src/databits_callerid.c \
    "$REF"/src/databits_uic.c \
    "$REF"/src/simpleaudio.c "$REF"/src/simpleaudio-sndfile.c \
    "$REF"/src/simple-tone-generator.c \
    "$HERE"/fftw3f_shim.c \
    "$SNDLIB" -Wl,-rpath,"$SNDDIR" -Wl,--disable-new-dtags -lm

echo "$OUT/minimodem"
