#!/usr/bin/env bash
# Lint driver (counterpart of the reference's linter.sh:1-32: isort/black/
# flake8/mypy). Runs whichever tools are installed; always bytecode-checks.
set -u
ok=0
have() { python -c "import $1" >/dev/null 2>&1; }
have isort  && { echo "== isort";  python -m isort --check-only sam_quantization_tpu tests || ok=1; }
have black  && { echo "== black";  python -m black --check sam_quantization_tpu tests || ok=1; }
have flake8 && { echo "== flake8"; python -m flake8 sam_quantization_tpu || ok=1; }
have mypy   && { echo "== mypy";   python -m mypy --ignore-missing-imports sam_quantization_tpu || ok=1; }
echo "== compileall"
python -m compileall -q sam_quantization_tpu tests bench.py __graft_entry__.py || ok=1
exit $ok
