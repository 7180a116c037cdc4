#!/usr/bin/env bash
# Profile a flagship solve (the reference's analog is tools/perf-benchmark.sh,
# which wraps `perf record`; under XLA the interesting split is
# host-vs-device, so this wraps cProfile + the solver's own time-trace
# tables).
#
# Usage: ./tools/perf-benchmark.sh [N]
set -euo pipefail
cd "$(dirname "$0")/.."
N="${1:-100}"

python - <<PY
import cProfile, pstats, sys, io
sys.path.insert(0, ".")
from sleipnir_tpu.models.cart_pole import cart_pole_problem

problem, X, U = cart_pole_problem(N=${N}, total_time=5.0)
problem.solve()  # compile outside the profile

import numpy as np, math
guess = np.zeros((4, ${N} + 1))
guess[0] = np.linspace(0.0, 1.0, ${N} + 1)
guess[1] = np.linspace(0.0, math.pi, ${N} + 1)
X.set_value(guess); U.set_value(np.zeros((1, ${N} + 1)))

prof = cProfile.Profile()
prof.enable()
status = problem.solve()
prof.disable()
print("status:", status)
s = io.StringIO()
pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(25)
print(s.getvalue())
PY
