#!/bin/sh
# Pre-commit gate (r7 verdict item 8): the round-7 snapshot commit shipped
# two queries registered AFTER the session's last full pytest — invisible
# to every gate until the next round's judge ran the suite. These two
# integrity tests are <1 s, spin up no Spark, and catch exactly that
# state: every registered query must carry a COVERAGE.md claim, and no
# query may sit outside the driver window without a committed external
# green row (which a brand-new query cannot have).
#
# Install:  ln -sf ../../scripts/precommit.sh .git/hooks/pre-commit
set -e
cd "$(git rev-parse --show-toplevel)"
exec python -m pytest tests/test_coverage_integrity.py -q --no-header -x
