#!/bin/bash
# Record golden fixtures from the reference C solver builds.
# Run from anywhere; writes into tests/golden/.  Fixtures are committed so
# CI never needs the reference tree; this script documents their provenance.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
BIN="$HERE/../oracle/bin"
[ -x "$BIN/boltzmann_c_solver" ] || "$HERE/../oracle/build_reference.sh"

COMMON="E_dc=1.0 E_omega=2.0 omega=1.0 mu=1.0 alpha=0.9495 PhiYmin=-10 PhiYmax=10 B=0.1 dt=0.001 quiet=1"
WORK=$(mktemp -d)
cd "$WORK"

run() { # binary outfile args...
  local bin=$1 out=$2; shift 2
  "$BIN/$bin" "$@" o="$out" >/dev/null 2>&1 || true
}

# 1. display=4 small (t-max=1): f32 and f64
run boltzmann_c_solver     d4_small_f32.txt display=4 $COMMON n-harmonics=20 g-grid=200 t-max=1
run boltzmann_c_solver_f64 d4_small_f64.txt display=4 $COMMON n-harmonics=20 g-grid=200 t-max=1

# 2. display=4 BASELINE config #1 horizon (t-max=10): f32 and f64
run boltzmann_c_solver     d4_base1_f32.txt display=4 $COMMON n-harmonics=20 g-grid=200 t-max=10
run boltzmann_c_solver_f64 d4_base1_f64.txt display=4 $COMMON n-harmonics=20 g-grid=200 t-max=10

# 3. display=4 BASELINE config #2 shape (N=40, M=500), shorter horizon
run boltzmann_c_solver_f64 d4_n40_f64.txt display=4 $COMMON n-harmonics=40 g-grid=500 t-max=2

OMEGA10=${COMMON/omega=1.0/omega=10.0}
# 4. display=3 tiny distribution dump (f64; in-bounds loops)
run boltzmann_c_solver_f64 d3_tiny_f64.txt display=3 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.5

# 5. display=77 time series (f64) — only norm/t columns are pinnable
#    (reference OOB sums + in-place normalization, docs/DEVIATIONS.md D1/D2)
run boltzmann_c_solver_f64 d77_tiny_f64.txt display=77 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.2

# 5b. display=77 from the D1/D2-patched build: all 15 columns pinnable
run boltzmann_c_solver_f64_d77 d77_tiny_f64_fixed.txt display=77 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.2

# 5c. display=77 at PRODUCTION precision: pristine f32 + the D1/D2 patch,
#     all 15 columns pinnable within the FMA envelope (DEVIATIONS D7)
run boltzmann_c_solver_f32_d77 d77_tiny_f32_fixed.txt display=77 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.2

# 4b. display=3 at production precision (pristine binary: the display-3
#     loops are in-bounds in the reference, no patch needed)
run boltzmann_c_solver d3_tiny_f32.txt display=3 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.5

# 6. display=7 movie frames (f64): frames land in cwd as frame%08d.data
"$BIN/boltzmann_c_solver_f64" display=7 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.2 o=d7_out.txt >/dev/null 2>&1 || true
cp frame00000001.data d7_frame1_f64.txt
cp frame00000002.data d7_frame2_f64.txt
rm -f frame*.data

# 6b. display=7 movie frames from the pristine f32 binary (the production
# precision; pinned with the FMA-envelope tolerance, DEVIATIONS D7)
"$BIN/boltzmann_c_solver" display=7 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.2 o=d7_out32.txt >/dev/null 2>&1 || true
cp frame00000001.data d7_frame1_f32.txt
cp frame00000012.data d7_frame12_f32.txt

# 7. parameter-server session (f64): display=4, two mutations then exit
printf 'E_dc 1.5 0.5\nB 0.2 0.5\nmu 1.3 0.3\nomega 12.0 0.3\nexit\n' | \
  "$BIN/boltzmann_c_solver_f64" display=4 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.5 read-from=stdin o=repl_f64.txt >/dev/null 2>&1 || true

# 7b. parameter-server FUZZ session (f64): the fscanf quirk matrix —
# partial numeric prefixes (1.5x -> 1.5 + pushed-back "x"), failed %f
# resuming AT the failed token, unknown names, and `exit value timeout`
# parsing as a non-exiting unknown-name mutation (pcount==3 skips the
# exit check, src/boltzmann_cli.c:76-79).  Must end with a bare exit:
# the reference fscanf loop spins forever at EOF (docs/DEVIATIONS.md D14).
printf 'E_dc 1.5x 0.40\nbogus 7 0.30\nB .25e0 0.35\nexit 0.9 0.30\nmu abc 1.1 0.25\nexit\n' | \
  "$BIN/boltzmann_c_solver_f64" display=4 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.5 read-from=stdin o=repl_fuzz_f64.txt >/dev/null 2>&1 || true

# 7c. parameter-server under display=77 (f64, patched-d77 oracle build —
# the full-column D1/D2 fixes): time-series lines continuing across one
# mutation round
printf 'E_dc 1.6 0.2\nexit\n' | \
  "$BIN/boltzmann_c_solver_f64_d77" display=77 $OMEGA10 n-harmonics=8 g-grid=24 t-max=0.3 read-from=stdin o=repl_d77_f64.txt >/dev/null 2>&1 || true

gzip -nf d3_tiny_f64.txt d7_frame1_f64.txt d7_frame2_f64.txt
gzip -nf d7_frame1_f32.txt d7_frame12_f32.txt
gzip -nf d77_tiny_f64.txt d77_tiny_f64_fixed.txt
gzip -nf d77_tiny_f32_fixed.txt d3_tiny_f32.txt repl_d77_f64.txt
cp d4_*.txt repl_f64.txt repl_fuzz_f64.txt *.gz "$HERE/"
cd /; rm -rf "$WORK"
echo "golden fixtures written to $HERE"
