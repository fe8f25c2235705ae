"""REST conformance against the reference's OWN scenario corpus.

Runs the unmodified YAML scenarios from
``/root/reference/quickwit/rest-api-tests/scenarii`` against our HTTP
server through quickwit_spark.testing.conformance (a from-scratch
implementation of run_tests.py's step semantics).  Every suite listed
here must be fully green — steps the engine KNOWINGLY diverges on are
declared in DEFAULT_WAIVERS with a reason and show up as skips."""

import os

import pytest

from quickwit_spark.search.http_api import SearchHttpServer
from quickwit_spark.testing.conformance import (
    DEFAULT_WAIVERS, REFERENCE_SCENARII, ScenarioRunner)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_SCENARII),
    reason="reference scenario corpus not present")

# suites that must be 100% green (grown as conformance work lands)
GREEN_SUITES = [
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


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("conformance"))
    with SearchHttpServer(root, writable=True) as srv:
        yield srv


@pytest.mark.parametrize("suite", GREEN_SUITES)
def test_suite_green(server, suite):
    runner = ScenarioRunner(server.url, waivers=DEFAULT_WAIVERS)
    results = runner.run_suite(suite)
    assert results, f"no scenarios found for {suite}"
    bad = [r for r in results if not r.ok]
    assert not bad, "\n".join(str(r.failure) for r in bad)
