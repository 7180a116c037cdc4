#!/usr/bin/env bash
# Test-coverage report for sleipnir_tpu (the reference's analog is
# tools/generate-coverage.sh over llvm-cov).
#
# Usage: ./tools/generate-coverage.sh [pytest args...]
set -euo pipefail
cd "$(dirname "$0")/.."

if python -c "import pytest_cov" 2>/dev/null; then
    python -m pytest tests/ -q \
        --cov=sleipnir_tpu --cov-report=term --cov-report=html "$@"
    echo "HTML report: htmlcov/index.html"
elif python -c "import coverage" 2>/dev/null; then
    python -m coverage run -m pytest tests/ -q "$@"
    python -m coverage report --include='sleipnir_tpu/*'
    python -m coverage html --include='sleipnir_tpu/*'
    echo "HTML report: htmlcov/index.html"
else
    echo "error: install 'coverage' or 'pytest-cov' first" >&2
    exit 1
fi
