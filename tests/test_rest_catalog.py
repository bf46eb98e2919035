"""REST catalog client against a real local HTTP server serving the
Iceberg REST subset the reference's CI uses (metadata-location
resolution -> iceberg_scan), with golden row counts."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

LI = "/root/reference/data/iceberg/lineitem_iceberg"


class _Handler(BaseHTTPRequestHandler):
    routes = {
        "/v1/config": {"defaults": {}, "overrides": {}},
        "/v1/namespaces": {"namespaces": [["default"]]},
        "/v1/namespaces/default/tables": {
            "identifiers": [{"namespace": ["default"], "name": "lineitem"}]
        },
        "/v1/namespaces/default/tables/lineitem": {
            "metadata-location": f"{LI}/metadata/v2.metadata.json",
            "metadata": {},
        },
    }

    seen_auth = []
    token_posts = []

    def do_POST(self):
        if self.path.split("?")[0] != "/v1/oauth/tokens":
            self.send_response(404)
            self.end_headers()
            return
        import urllib.parse

        n = int(self.headers.get("Content-Length", 0))
        form = urllib.parse.parse_qs(self.rfile.read(n).decode())
        _Handler.token_posts.append(form)
        body = json.dumps({"access_token": "tok-123", "token_type": "bearer"}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):
        _Handler.seen_auth.append(self.headers.get("Authorization"))
        doc = self.routes.get(self.path.split("?")[0])
        if doc is None:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(doc).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def rest_uri():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_rest_catalog_listing(rest_uri):
    from duckdb_iceberg_spark.sources.rest_catalog import RestCatalog

    cat = RestCatalog(rest_uri)
    assert cat.config() == {"defaults": {}, "overrides": {}}
    assert cat.list_namespaces() == [("default",)]
    assert cat.list_tables("default") == ["lineitem"]
    assert cat.metadata_location("default", "lineitem").endswith("v2.metadata.json")


def test_rest_catalog_scan_golden(spark, rest_uri):
    """The start-rest-catalog.sh flow: REST metadata-location ->
    iceberg_scan; golden count 51793 (BASELINE.md)."""
    from duckdb_iceberg_spark.sources.rest_catalog import RestCatalog

    cat = RestCatalog(rest_uri)
    assert cat.scan(spark, "default", "lineitem", allow_moved_paths=True).count() == 51793
    snaps = cat.snapshots(spark, "default", "lineitem")
    assert snaps.count() == 2


def test_rest_catalog_missing_location(rest_uri):
    from duckdb_iceberg_spark.sources.rest_catalog import RestCatalog

    _Handler.routes["/v1/namespaces/default/tables/empty"] = {"metadata": {}}
    with pytest.raises(ValueError, match="no metadata-location"):
        RestCatalog(rest_uri).metadata_location("default", "empty")


def test_rest_catalog_oauth2_client_credentials(rest_uri):
    """credential="id:secret" is exchanged at /v1/oauth/tokens once
    and the bearer lands on every subsequent request (DuckDB ICEBERG
    secret CLIENT_ID/CLIENT_SECRET parity)."""
    from duckdb_iceberg_spark.sources.rest_catalog import RestCatalog

    _Handler.seen_auth = []
    _Handler.token_posts = []
    cat = RestCatalog(rest_uri, credential="my-client:my-secret")
    assert cat.list_namespaces() == [("default",)]
    assert cat.list_tables("default") == ["lineitem"]
    # one token POST, correct form fields
    assert len(_Handler.token_posts) == 1
    form = _Handler.token_posts[0]
    assert form["grant_type"] == ["client_credentials"]
    assert form["client_id"] == ["my-client"]
    assert form["client_secret"] == ["my-secret"]
    # bearer attached to both GETs
    assert _Handler.seen_auth[-2:] == ["Bearer tok-123", "Bearer tok-123"]


def test_rest_catalog_static_token_header(rest_uri):
    from duckdb_iceberg_spark.sources.rest_catalog import RestCatalog

    _Handler.seen_auth = []
    RestCatalog(rest_uri, token="static-tok").list_namespaces()
    assert _Handler.seen_auth[-1] == "Bearer static-tok"
