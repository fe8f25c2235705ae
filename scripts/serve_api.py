"""Serve the search REST API over HTTP.

    python scripts/serve_api.py --root-dir /path/with/index/dirs \
        [--host 127.0.0.1] [--port 7280] [--writable]

Serves every index directory under --root-dir (subdir name = index id)
on the reference's route surface: native /api/v1/{index}/search, the
ES-compatible /api/v1/_elastic/* family, and the index-management API
(/api/v1/indexes/*, /{index}/ingest, /{index}/delete-tasks, /analyze,
/parse-query). Read-only unless --writable, which enables every
mutation route — create/update/clear/delete, ingest, _bulk,
_delete_by_query, delete tasks. Indexes created through the API
persist their full config (index_config.json), so ingest works across
restarts; programmatically built indexes need one registered via the
SearchHttpServer(configs=...) API for _bulk/ingest. Port 7280 mirrors
the reference's default REST port.
"""

from __future__ import annotations

import argparse
import os
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--root-dir", required=True,
                   help="directory whose subdirectories are indexes")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7280)
    p.add_argument("--writable", action="store_true",
                   help="enable _delete_by_query")
    args = p.parse_args()

    from quickwit_spark.search.http_api import SearchHttpServer

    srv = SearchHttpServer(args.root_dir, host=args.host,
                           port=args.port,
                           writable=args.writable).start()
    print(f"serving {args.root_dir} at {srv.url} "
          f"({'writable' if args.writable else 'read-only'})",
          flush=True)
    try:
        signal.pause()
    except (KeyboardInterrupt, AttributeError):
        pass
    finally:
        srv.stop()


if __name__ == "__main__":
    main()
