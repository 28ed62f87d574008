#!/bin/sh
# Build the reference decoder (sources compiled unmodified from
# /root/reference) with our file-input shim in place of main.c/rtl.c.
set -e
REF=${REF:-/root/reference}
OUT=${OUT:-$(dirname "$0")/ref_shim}
SRCS="$REF/d8psk.c $REF/vdlm2.c $REF/viterbi.c $REF/rs.c \
      $REF/crc.c $REF/out.c $REF/outacars.c $REF/outxid.c \
      $REF/label.c $REF/cJSON.c"
cc -O2 -DWITH_RTL -I"$REF" "$(dirname "$0")/shim.c" $SRCS \
    -lm -lpthread -o "$OUT"
echo "built $OUT"
cc -O2 -DWITH_AIR -I"$REF" "$(dirname "$0")/shim_air.c" $SRCS \
    -lm -lpthread -o "${OUT}_air"
echo "built ${OUT}_air"
D=$(dirname "$0")
cc -O2 -DWITH_RTL -DSHIM_RTL -I"$D/fakeinc" -I"$REF" \
    "$D/shim_choosefc.c" -lm -lpthread -o "${OUT%_shim}_shim_choosefc_rtl"
echo "built ${OUT%_shim}_shim_choosefc_rtl"
cc -O2 -DWITH_AIR -DSHIM_AIR -I"$D/fakeinc" -I"$REF" \
    "$D/shim_choosefc.c" -lm -lpthread -o "${OUT%_shim}_shim_choosefc_air"
echo "built ${OUT%_shim}_shim_choosefc_air"
