"""Iceberg REST catalog client (stdlib-only, no extra deps).

The reference exercises exactly this flow in CI: resolve a table's
``metadata-location`` from a REST catalog, then hand that path to
``iceberg_scan`` (reference scripts/start-rest-catalog.sh:14-27 —
``curl .../v1/namespaces/default/tables/table_unpartitioned | jq -r
'."metadata-location"'`` piped into ``iceberg_scan``). The C++
extension itself has no catalog code (SURVEY.md §2A "Catalogs"); this
client gives the same observable capability as a first-class API.

Endpoints implemented (Iceberg REST spec, the subset the
tabulario/iceberg-rest image serves):
- ``GET  /v1/config``
- ``GET  /v1/namespaces``
- ``GET  /v1/namespaces/{ns}/tables``
- ``GET  /v1/namespaces/{ns}/tables/{table}``  -> metadata-location

All catalog traffic is driver-side metadata (KB-scale JSON); the data
path stays on executors via iceberg_scan, so this adds zero scale
risk at 100 TB.
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class RestCatalog:
    """Auth parity with DuckDB's ICEBERG secret surface: a static
    bearer ``token``, or an OAuth2 client-credentials ``credential``
    ("client_id:client_secret") exchanged at ``oauth2_server_uri``
    (default ``<uri>/v1/oauth/tokens``, the Iceberg REST spec token
    endpoint) on first request. SigV4 request signing (AWS-hosted
    catalogs) is out of scope — no object store in this environment;
    use a pre-issued bearer token against such catalogs."""

    def __init__(
        self,
        uri: str,
        *,
        token: Optional[str] = None,
        credential: Optional[str] = None,
        oauth2_server_uri: Optional[str] = None,
        oauth2_scope: str = "catalog",
        warehouse: Optional[str] = None,
        timeout: float = 30.0,
    ):
        self.uri = uri.rstrip("/")
        self.token = token
        self.credential = credential
        self.oauth2_server_uri = oauth2_server_uri or f"{self.uri}/v1/oauth/tokens"
        self.oauth2_scope = oauth2_scope
        self.warehouse = warehouse
        self.timeout = timeout

    # -- transport --------------------------------------------------------
    def _ensure_token(self) -> Optional[str]:
        """Lazy OAuth2 client-credentials exchange (one POST, cached)."""
        if self.token is None and self.credential:
            client_id, _, client_secret = self.credential.partition(":")
            form = urllib.parse.urlencode(
                {
                    "grant_type": "client_credentials",
                    "client_id": client_id,
                    "client_secret": client_secret,
                    "scope": self.oauth2_scope,
                }
            ).encode("utf-8")
            req = urllib.request.Request(
                self.oauth2_server_uri,
                data=form,
                headers={"Content-Type": "application/x-www-form-urlencoded"},
            )
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                doc = json.loads(resp.read().decode("utf-8"))
            if "access_token" not in doc:
                raise ValueError(f"OAuth2 token endpoint returned no access_token: {sorted(doc)}")
            self.token = doc["access_token"]
        return self.token

    def _get(self, path: str) -> dict:
        req = urllib.request.Request(f"{self.uri}{path}")
        token = self._ensure_token()
        if token:
            req.add_header("Authorization", f"Bearer {token}")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return json.loads(resp.read().decode("utf-8"))

    # -- spec endpoints ---------------------------------------------------
    def config(self) -> dict:
        q = f"?warehouse={urllib.parse.quote(self.warehouse)}" if self.warehouse else ""
        return self._get(f"/v1/config{q}")

    def list_namespaces(self) -> list[tuple[str, ...]]:
        doc = self._get("/v1/namespaces")
        return [tuple(ns) for ns in doc.get("namespaces", [])]

    def list_tables(self, namespace: str) -> list[str]:
        ns = urllib.parse.quote(namespace)
        doc = self._get(f"/v1/namespaces/{ns}/tables")
        return [t["name"] for t in doc.get("identifiers", [])]

    def load_table(self, namespace: str, table: str) -> dict:
        ns = urllib.parse.quote(namespace)
        return self._get(f"/v1/namespaces/{ns}/tables/{urllib.parse.quote(table)}")

    def metadata_location(self, namespace: str, table: str) -> str:
        doc = self.load_table(namespace, table)
        loc = doc.get("metadata-location")
        if not loc:
            raise ValueError(
                f"REST catalog returned no metadata-location for {namespace}.{table}"
            )
        return loc

    # -- the reference flow: REST -> iceberg_scan -------------------------
    def scan(self, spark: SparkSession, namespace: str, table: str, **kwargs) -> DataFrame:
        """`iceberg_scan` on the REST-resolved metadata-location — the
        library form of start-rest-catalog.sh's curl|jq|iceberg_scan."""
        from .iceberg import iceberg_scan

        return iceberg_scan(spark, self.metadata_location(namespace, table), **kwargs)

    def snapshots(self, spark: SparkSession, namespace: str, table: str, **kwargs) -> DataFrame:
        from .iceberg import iceberg_snapshots

        return iceberg_snapshots(spark, self.metadata_location(namespace, table), **kwargs)
