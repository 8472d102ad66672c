#!/bin/sh
# f32 noise-floor experiment (docs/DEVIATIONS.md D7): build the pristine
# reference with different legal FP settings and diff its display-4
# observables against itself at the BASELINE #1 horizon.
#
# Measured result (this box, gcc 2026-08):
#   -O0 / -O3 / -O3 -march=native -ffp-contract=off  -> bit-identical
#   -O3 -march=native (FMA contraction ON)           -> max rel 1.0e-5
#
# i.e. the only thing that moves the f32 trajectory is FMA contraction —
# which XLA applies unconditionally (verified: jit(a*b+c) == f64 proxy,
# != separately-rounded product+add).  The framework's f32 engines are
# therefore "an FMA build" of the same numerics; their deviation from the
# pristine binary (<= 5.4e-6 abs on the cancellation-prone v_y, <= 2e-6
# abs elsewhere) is the same class as the reference's own FMA rebuild.
set -e
HERE=$(cd "$(dirname "$0")" && pwd)
REF=${REF:-/root/reference}
mkdir -p "$HERE/bin"

build() {
  gcc -std=gnu99 $2 -m64 -I"$HERE/gsl_shim" \
    "$REF/src/boltzmann_c_solver.c" "$REF/src/boltzmann_cli.c" \
    -o "$HERE/bin/noise_$1" -lm 2>/dev/null
}
build O3 "-O3"
build O0 "-O0"
build O3fma "-O3 -march=native"
build O3nofma "-O3 -march=native -ffp-contract=off"

ARGS="display=4 E_dc=1.0 E_omega=2.0 omega=1.0 mu=1.0 alpha=0.9495
      n-harmonics=20 PhiYmin=-10 PhiYmax=10 B=0.1 t-max=10 g-grid=200
      dt=0.001 quiet=1"
for v in O3 O0 O3fma O3nofma; do
  "$HERE/bin/noise_$v" $ARGS o="$HERE/bin/noise_$v.txt" >/dev/null 2>&1
done

python3 - "$HERE/bin" <<'EOF'
import sys, numpy as np
d = sys.argv[1]
def line(p):
    return np.array([ln for ln in open(p).read().splitlines()
                     if ln and not ln.startswith("#")][0].split(), float)
base = line(f"{d}/noise_O3.txt")
for v in ("O0", "O3fma", "O3nofma"):
    x = line(f"{d}/noise_{v}.txt")
    rel = np.abs(x - base) / np.maximum(np.abs(base), 1e-300)
    print(f"{v:10s} max rel vs -O3: {rel.max():.3e}")
EOF
