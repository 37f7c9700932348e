#!/bin/sh
# Real-PostgreSQL dialect-assumption probe for sources/StorageHandler's
# direct-JDBC surface (see COVERAGE.md "External-engine roles"). The
# handler documents three engine assumptions it cannot unit-test
# against embedded Derby alone:
#   1. unquoted DDL identifiers case-normalize per engine (Derby UPPER,
#      PostgreSQL lower) — hence the existence probe tries raw, UPPER,
#      and lower spellings;
#   2. `DROP TABLE <name>` with the unquoted identifier resolves the
#      table the unquoted CREATE produced;
#   3. the pushdown WHERE shapes Spark's PostgresDialect emits
#      (comparison + LIKE) execute server-side.
# This script validates all three against a REAL postgres server via
# psql. The full Spark-JDBC pushdown suite (StorageHandlerSpec) still
# needs the org.postgresql JDBC driver jar on the classpath, which this
# zero-egress image does not ship — the psql probe is the strongest
# proof the environment admits. Run 2026-08-15 against PostgreSQL 15
# (initdb + pg_ctl in /tmp): every expectation held — see the expected
# block at the bottom.
#
# Usage: pg_dialect_probe.sh [host] [port] [user] [db]
set -e
HOST=${1:-/tmp/pgsock}; PORT=${2:-54329}; USER=${3:-graft}; DB=${4:-postgres}
# ON_ERROR_STOP makes psql exit non-zero on any statement failure (set
# -e alone only sees psql's exit code); the IF EXISTS preamble clears a
# stale table a previously interrupted run may have left behind
psql -h "$HOST" -p "$PORT" -U "$USER" "$DB" -X -q -t -A \
  -v ON_ERROR_STOP=1 <<'EOF'
DROP TABLE IF EXISTS Foo_Bar;
CREATE TABLE Foo_Bar (p_partkey bigint, p_name text, p_retailprice double precision);
SELECT 'normalized:' || table_name FROM information_schema.tables WHERE table_schema='public';
SELECT 'probe_raw:' || count(*) FROM information_schema.tables WHERE table_name='Foo_Bar';
SELECT 'probe_upper:' || count(*) FROM information_schema.tables WHERE table_name='FOO_BAR';
SELECT 'probe_lower:' || count(*) FROM information_schema.tables WHERE table_name='foo_bar';
INSERT INTO Foo_Bar VALUES (1, 'green widget', 10.5), (2, 'red gadget', 99.0);
SELECT 'filter:' || count(*) FROM Foo_Bar WHERE p_retailprice > 50.0 AND p_name LIKE '%gadget%';
DROP TABLE Foo_Bar;
SELECT 'after_drop:' || count(*) FROM information_schema.tables WHERE table_schema='public';
EOF
# Expected (validated on PostgreSQL 15.x):
#   normalized:foo_bar   -- unquoted DDL lower-normalizes
#   probe_raw:0          -- raw spelling misses ...
#   probe_upper:0        -- ... so does Derby's UPPER spelling ...
#   probe_lower:1        -- ... the lower probe is the one that hits
#   filter:1             -- pushdown WHERE shape executes
#   after_drop:0         -- unquoted DROP resolved the same table
