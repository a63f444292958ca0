#!/bin/sh
# CI entrypoint (equivalent of the reference's scripts/jenkins/*.sh test leg:
# build + simple_test.sh). Runs the full suite, which embeds the golden
# end-to-end gates cloned from test/simple_test.sh and simple_full_test.sh.
set -e
cd "$(dirname "$0")/../.."
python -m pytest tests/ -x -q
python bench.py
