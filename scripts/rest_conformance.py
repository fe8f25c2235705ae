#!/usr/bin/env python3
"""Run the reference's rest-api-tests scenario corpus against our
HTTP server.

Boots a fresh SearchHttpServer over a temp root dir (writable — the
scenarios create/ingest/delete their own indexes, like the reference
runner does against `quickwit run`), executes the requested suites
with quickwit_spark.testing.conformance, and prints the per-scenario
summary.

    python scripts/rest_conformance.py                 # every suite
    python scripts/rest_conformance.py qw_search_api   # one suite
    python scripts/rest_conformance.py es_compatibility --only 0003
"""

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from quickwit_spark.search.http_api import SearchHttpServer
from quickwit_spark.testing.conformance import (
    DEFAULT_WAIVERS, REFERENCE_SCENARII, ScenarioRunner)

DEFAULT_SUITES = [
    "es_compatibility_info",
    "qw_search_api",
    "default_search_fields",
    "tag_fields",
    "concat_fields",
    "multi_splits",
    "search_after",
    "sort_orders",
    "aggregations",
    "es_field_capabilities",
    "es_compatibility",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("suites", nargs="*", default=None)
    ap.add_argument("--only", nargs="*", default=None,
                    help="scenario filename prefixes to run")
    ap.add_argument("--root", default=REFERENCE_SCENARII)
    args = ap.parse_args()
    suites = args.suites or DEFAULT_SUITES
    with tempfile.TemporaryDirectory() as tmp:
        with SearchHttpServer(tmp, writable=True) as srv:
            runner = ScenarioRunner(srv.url, scenario_root=args.root,
                                    waivers=DEFAULT_WAIVERS)
            for suite in suites:
                runner.run_suite(suite, only=args.only)
            print(runner.summary())
            bad = [r for r in runner.results if not r.ok]
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
