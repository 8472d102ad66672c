#!/bin/sh
# Build the reference C solver (the numerics oracle, SURVEY.md §4) against
# the local GSL shim.  Binaries land in tests/oracle/bin/ (gitignored).
# Golden outputs recorded from them are committed under tests/golden/.
#
# Two builds:
#   boltzmann_c_solver      — pristine reference (ffloat = float)
#   boltzmann_c_solver_f64  — same sources with ffloat = double (staged into
#                             a temp dir; quoted includes resolve to the
#                             source dir, so the typedef is flipped there)
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
mkdir -p "$HERE/bin"

gcc -std=gnu99 -O3 -m64 \
  -I"$HERE/gsl_shim" \
  "$REF/src/boltzmann_c_solver.c" "$REF/src/boltzmann_cli.c" \
  -o "$HERE/bin/boltzmann_c_solver" -lm 2>/dev/null
echo "built $HERE/bin/boltzmann_c_solver"

STAGE=$(mktemp -d)
cp "$REF"/src/boltzmann_c_solver.c "$REF"/src/boltzmann_cli.c \
   "$REF"/src/boltzmann_cli.h "$REF"/src/boltzmann.h \
   "$REF"/src/constants.h "$STAGE/"
# scan_for_new_parameters fscanf's %f into ffloat variables
# (src/boltzmann_cli.c:75) — wrong width once ffloat=double
sed -i 's/"%s %f %f"/"%s %lf %lf"/' "$STAGE/boltzmann_cli.c"
sed -i 's/#define ffloat float/#define ffloat double/' "$STAGE/boltzmann.h"
# The reference under-allocates av_data (calloc(5) but indices 0..5 used,
# src/boltzmann_c_solver.c:155 — SURVEY.md §2.1).  Harmless at 4-byte
# floats (glibc chunk rounding absorbs it) but heap-corrupting at 8-byte
# doubles, aborting before output flushes.  The f64 oracle build gets the
# one-word fix; the pristine f32 build stays byte-for-byte reference.
sed -i 's/calloc(5, sizeof(ffloat))/calloc(6, sizeof(ffloat))/' \
  "$STAGE/boltzmann_c_solver.c"
# The C driver's parameter server never applies mutations (missing
# load_data(), unlike the GPU driver at src/boltzmann_solver.c:391, so the
# stale locals keep driving the dynamics — SURVEY-class defect, documented
# as docs/DEVIATIONS.md D11).  The staged oracle gets the GPU behavior:
# load_data() must run BEFORE the T re-derivation (the GPU reads
# host_omega, which scan_for_new_parameters already updated,
# src/boltzmann_solver.c:390), so an omega mutation yields the NEW period.
sed -i 's|^    T=omega>0?(2\*PI/omega):0;|    load_data(); T=omega>0?(2*PI/omega):0;|' \
  "$STAGE/boltzmann_c_solver.c"
gcc -std=gnu99 -O3 -m64 \
  -I"$HERE/gsl_shim" \
  "$STAGE/boltzmann_c_solver.c" "$STAGE/boltzmann_cli.c" \
  -o "$HERE/bin/boltzmann_c_solver_f64" -lm 2>/dev/null
echo "built $HERE/bin/boltzmann_c_solver_f64"

# Third build: f64 + the display-77 defects fixed (docs/DEVIATIONS.md
# D1/D2), for pinning ALL 15 display-77 columns, not just t/norm:
#   D1: print_time_evolution_of_parameters sums m < 2*M+2, reading past
#       the live region into harmonic row 1 (src/boltzmann_c_solver.c:306)
#       -> the av() bounds m < M+1 (:417), which this framework uses;
#   D2: it scales av_data[1..5] IN PLACE (:319-325), compounding the
#       multipliers across emissions -> local copies, print those.
sed -i '298,340{
  s/for( int m = 1; m < 2\*M+2; m++ ) {/for( int m = 1; m < M+1; m++ ) {/
  s/av_data\[1\] \*= v_dr_multiplier;/ffloat d1 = av_data[1] * v_dr_multiplier;/
  s/av_data\[2\] \*= v_y_multiplier;/ffloat d2 = av_data[2] * v_y_multiplier;/
  s/av_data\[3\] \*= m_over_multiplier;/ffloat d3 = av_data[3] * m_over_multiplier;/
  s/av_data\[4\] \*= v_dr_multiplier;/ffloat d4 = av_data[4] * v_dr_multiplier;/
  s/av_data\[4\] \/= t;/d4 \/= t;/
  s/av_data\[5\] \*= v_dr_multiplier;/ffloat d5 = av_data[5] * v_dr_multiplier;/
  s/av_data\[5\] \/= t;/d5 \/= t; (void)d5;/
  s/v_dr_inst, av_data\[4\], norm/v_dr_inst, d4, norm/
  s/av_data\[1\], av_data\[2\], av_data\[3\]/d1, d2, d3/
  s/, t, av_data\[4\]);/, t, d4);/
}' "$STAGE/boltzmann_c_solver.c"
gcc -std=gnu99 -O3 -m64 \
  -I"$HERE/gsl_shim" \
  "$STAGE/boltzmann_c_solver.c" "$STAGE/boltzmann_cli.c" \
  -o "$HERE/bin/boltzmann_c_solver_f64_d77" -lm 2>/dev/null
rm -rf "$STAGE"
echo "built $HERE/bin/boltzmann_c_solver_f64_d77"

# Fourth build: PRISTINE f32 (production precision) + ONLY the D1/D2
# display-77 patch, for pinning all 15 display-77 columns at float32
# within the measured FMA envelope (docs/DEVIATIONS.md D7).
STAGE=$(mktemp -d)
cp "$REF"/src/boltzmann_c_solver.c "$REF"/src/boltzmann_cli.c \
   "$REF"/src/boltzmann_cli.h "$REF"/src/boltzmann.h \
   "$REF"/src/constants.h "$STAGE/"
sed -i '298,340{
  s/for( int m = 1; m < 2\*M+2; m++ ) {/for( int m = 1; m < M+1; m++ ) {/
  s/av_data\[1\] \*= v_dr_multiplier;/ffloat d1 = av_data[1] * v_dr_multiplier;/
  s/av_data\[2\] \*= v_y_multiplier;/ffloat d2 = av_data[2] * v_y_multiplier;/
  s/av_data\[3\] \*= m_over_multiplier;/ffloat d3 = av_data[3] * m_over_multiplier;/
  s/av_data\[4\] \*= v_dr_multiplier;/ffloat d4 = av_data[4] * v_dr_multiplier;/
  s/av_data\[4\] \/= t;/d4 \/= t;/
  s/av_data\[5\] \*= v_dr_multiplier;/ffloat d5 = av_data[5] * v_dr_multiplier;/
  s/av_data\[5\] \/= t;/d5 \/= t; (void)d5;/
  s/v_dr_inst, av_data\[4\], norm/v_dr_inst, d4, norm/
  s/av_data\[1\], av_data\[2\], av_data\[3\]/d1, d2, d3/
  s/, t, av_data\[4\]);/, t, d4);/
}' "$STAGE/boltzmann_c_solver.c"
gcc -std=gnu99 -O3 -m64 \
  -I"$HERE/gsl_shim" \
  "$STAGE/boltzmann_c_solver.c" "$STAGE/boltzmann_cli.c" \
  -o "$HERE/bin/boltzmann_c_solver_f32_d77" -lm 2>/dev/null
rm -rf "$STAGE"
echo "built $HERE/bin/boltzmann_c_solver_f32_d77"
