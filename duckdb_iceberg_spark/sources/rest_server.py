"""Embedded Iceberg REST catalog server (stdlib-only, local files).

The reference exercises its REST flow against a dockerized catalog
(reference scripts/start-rest-catalog.sh); this module is the
equivalent local fixture as a library: a minimal but spec-shaped
catalog that OWNS the table pointer and applies commits —

- ``GET  /v1/config`` / ``/v1/namespaces`` / namespace load / table
  list / table load
- ``POST /v1/oauth/tokens``            (client-credentials grant)
- ``POST /v1/namespaces``              (createNamespace; 409 if exists)
- ``DELETE /v1/namespaces/{ns}``       (dropNamespace; 409 non-empty)
- ``POST /v1/namespaces/{ns}/register`` (registerTable)
- ``DELETE /v1/namespaces/{ns}/tables/{t}`` (dropTable -> 204)
- ``POST /v1/tables/rename``           (renameTable -> 204; 404/409)
- ``POST /v1/namespaces/{ns}/tables/{t}`` (commitTable: validates
  ``requirements`` — assert-ref-snapshot-id — against ITS current
  metadata, applies ``updates`` — add-snapshot / set-snapshot-ref /
  set-properties — and writes a NEW metadata json next to the old one,
  exactly the pointer-owning behavior of a real catalog; a stale
  requirement gets 409)
- ``POST /v1/transactions/commit``     (commitTransaction: ATOMIC
  multi-table commit — every table's requirements are validated and
  its updates staged before ANY pointer moves; one stale table fails
  the whole transaction with 409 and nothing is applied)

Used by tests/test_rest_catalog.py and the rest_catalog_commit oracle
entry. Single-process HTTP on a loopback port; metadata documents are
KB-scale JSON, so this is a driver-side fixture with no data-path role.
"""

from __future__ import annotations

import gzip
import json
import os
import re
import threading
import uuid
from http.server import BaseHTTPRequestHandler, HTTPServer


class _BadRequest(ValueError):
    """Malformed client input -> HTTP 400."""


def _read_metadata(path: str) -> dict:
    with open(path, "rb") as f:
        raw = f.read()
    if path.endswith(".gz") or raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    return json.loads(raw.decode("utf-8"))


class LocalRestCatalogServer:
    """Spin up with ``start()``; ``uri`` gives the base URL."""

    def __init__(self, token: str = "local-dev-token", *, require_auth: bool = False):
        self.tables: dict[tuple[str, str], str] = {}  # (ns, table) -> metadata-location
        # namespaces exist independently of tables (createNamespace /
        # dropNamespace are first-class DDL in the REST spec); register
        # auto-creates for convenience, like the tabulario image
        self.namespaces: dict[str, dict] = {}  # ns -> properties
        self.token = token
        # require_auth: every /v1/* call except the token endpoint must
        # carry `Authorization: Bearer <token>` or gets 401 — lets
        # tests drive the client's OAuth2 exchange against a server
        # that actually rejects anonymous requests.
        self.require_auth = require_auth
        self._srv: HTTPServer | None = None

    # -- commit semantics --------------------------------------------------
    def _apply_commit(self, ns: str, table: str, body: dict) -> dict:
        key, doc = self._stage_commit(ns, table, body)
        return self._finalize_commit(key, doc)

    def _stage_commit(self, ns: str, table: str, body: dict) -> tuple[tuple, dict]:
        """Validate ``requirements`` and apply ``updates`` to an
        in-memory copy of the table's metadata — NO files are written
        and the pointer does not move. _finalize_commit persists.
        The split is what makes /v1/transactions/commit atomic: every
        table's requirements are checked (and updates computed) before
        ANY pointer moves, so a failing table leaves the whole
        transaction unapplied."""
        key = (ns, table)
        if key not in self.tables:
            raise KeyError(f"table {ns}.{table} not registered")
        mloc = self.tables[key]
        doc = _read_metadata(mloc)
        cur = doc.get("current-snapshot-id", -1)
        for req in body.get("requirements", []):
            rtype = req.get("type")
            if rtype == "assert-ref-snapshot-id" and req.get("ref") == "main":
                want = req.get("snapshot-id")
                have = None if cur == -1 else cur
                if want != have:
                    raise ValueError(
                        f"requirement failed: ref main is at {have}, commit asserts {want}"
                    )
            elif rtype == "assert-current-schema-id":
                want = req.get("current-schema-id")
                have = doc.get("current-schema-id", 0)
                if want != have:
                    raise ValueError(
                        f"requirement failed: current schema is {have}, commit asserts {want}"
                    )
        for upd in body.get("updates", []):
            action = upd.get("action")
            if action == "add-snapshot":
                snap = upd["snapshot"]
                doc["snapshots"] = doc.get("snapshots", []) + [snap]
                doc["last-sequence-number"] = max(
                    doc.get("last-sequence-number", 0), snap.get("sequence-number", 0)
                )
                doc["last-updated-ms"] = snap.get("timestamp-ms", doc.get("last-updated-ms"))
            elif action == "set-snapshot-ref":
                refs = dict(doc.get("refs", {}))
                refs[upd["ref-name"]] = {
                    "snapshot-id": upd["snapshot-id"],
                    "type": upd.get("type", "branch"),
                }
                doc["refs"] = refs
                if upd["ref-name"] == "main":
                    doc["current-snapshot-id"] = upd["snapshot-id"]
                    doc["snapshot-log"] = doc.get("snapshot-log", []) + [
                        {
                            "timestamp-ms": doc.get("last-updated-ms", 0),
                            "snapshot-id": upd["snapshot-id"],
                        }
                    ]
            elif action == "remove-snapshot-ref":
                refs = dict(doc.get("refs", {}))
                refs.pop(upd["ref-name"], None)
                doc["refs"] = refs
            elif action == "set-properties":
                props = dict(doc.get("properties", {}))
                props.update(upd.get("updates", {}))
                doc["properties"] = props
            elif action == "remove-properties":
                props = dict(doc.get("properties", {}))
                for k in upd.get("removals", []):
                    props.pop(k, None)
                doc["properties"] = props
            elif action == "add-schema":
                schema = upd["schema"]
                schemas = [
                    s for s in doc.get("schemas", []) if s.get("schema-id") != schema.get("schema-id")
                ]
                doc["schemas"] = schemas + [schema]
                field_ids = [f.get("id", 0) for f in schema.get("fields", [])]
                doc["last-column-id"] = max(
                    doc.get("last-column-id", 0),
                    upd.get("last-column-id", 0),
                    max(field_ids or [0]),
                )
            elif action == "set-current-schema":
                sid = upd["schema-id"]
                if sid == -1:  # spec: -1 = the schema added in this commit
                    sid = doc["schemas"][-1]["schema-id"]
                if not any(s.get("schema-id") == sid for s in doc.get("schemas", [])):
                    raise KeyError(f"schema {sid} not in table metadata")
                doc["current-schema-id"] = sid
            elif action == "remove-snapshots":
                gone = set(upd.get("snapshot-ids", []))
                doc["snapshots"] = [
                    s for s in doc.get("snapshots", []) if s["snapshot-id"] not in gone
                ]
                doc["snapshot-log"] = [
                    e for e in doc.get("snapshot-log", []) if e["snapshot-id"] not in gone
                ]
            else:
                raise ValueError(f"unsupported update action {action!r}")
        doc["metadata-log"] = doc.get("metadata-log", []) + [
            {"timestamp-ms": doc.get("last-updated-ms", 0), "metadata-file": mloc}
        ]
        return key, doc

    def _finalize_commit(self, key: tuple, doc: dict) -> dict:
        mloc = self.tables[key]
        new_loc = os.path.join(os.path.dirname(mloc), f"{uuid.uuid4().hex}-rest.metadata.json")
        with open(new_loc, "w") as f:
            json.dump(doc, f)
        self.tables[key] = new_loc
        return {"metadata-location": new_loc, "metadata": doc}

    def _ns_names(self) -> list[str]:
        return sorted(set(self.namespaces) | {k[0] for k in self.tables})

    # -- http plumbing -----------------------------------------------------
    def _handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def _send(self, code: int, doc: dict | None) -> None:
                if doc is None:  # 204 No Content responses
                    self.send_response(code)
                    self.send_header("Content-Length", "0")
                    self.end_headers()
                    return
                body = json.dumps(doc).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _authed(self) -> bool:
                if not server.require_auth:
                    return True
                return self.headers.get("Authorization") == f"Bearer {server.token}"

            def _page(self, items: list, key: str) -> dict:
                """Iceberg REST list pagination: pageToken is the
                offset into the (stable-sorted) full listing; emit
                next-page-token while more remain. Real catalogs cap
                pageSize server-side the same way (here: 1000).
                Garbage pageToken/pageSize raises _BadRequest -> 400
                (not a dropped connection)."""
                import urllib.parse as _up

                q = _up.parse_qs(_up.urlsplit(self.path).query)
                try:
                    size = min(int(q.get("pageSize", ["1000"])[0]), 1000)
                    off = int(q.get("pageToken", ["0"])[0])
                except ValueError:
                    raise _BadRequest("invalid pageToken/pageSize") from None
                # size < 1 included: pageSize=0 would answer an empty
                # page whose next-page-token equals the request's own
                # offset — a spec-following client that keeps fetching
                # while next-page-token is present would loop forever
                if size < 1 or off < 0:
                    raise _BadRequest("invalid pageToken/pageSize")
                doc = {key: items[off : off + size]}
                if off + size < len(items):
                    doc["next-page-token"] = str(off + size)
                return doc

            def do_GET(self):
                try:
                    return self._do_get()
                except _BadRequest as e:
                    return self._send(400, {"error": {"message": str(e)}})

            def _do_get(self):
                path = self.path.split("?")[0]
                if not self._authed():
                    return self._send(401, {"error": {"message": "unauthorized"}})
                if path == "/v1/config":
                    return self._send(200, {"defaults": {}, "overrides": {}})
                if path == "/v1/namespaces":
                    import urllib.parse as _up

                    q = _up.parse_qs(_up.urlsplit(self.path).query)
                    parent = q.get("parent", [None])[0]
                    levels = server._ns_names() or ["default"]
                    if parent:
                        # dot-separated multi-level namespaces: children
                        # exactly one level below `parent`
                        pfx = parent.split(".")
                        out = sorted(
                            {
                                ".".join(n.split(".")[: len(pfx) + 1])
                                for n in levels
                                if n.split(".")[: len(pfx)] == pfx and n != parent
                            }
                        )
                    else:
                        # spec: no parent -> FIRST-LEVEL namespaces only
                        # (a client recursing with parent= must not see
                        # children twice)
                        out = sorted({n.split(".")[0] for n in levels})
                    return self._send(
                        200, self._page([n.split(".") for n in out], "namespaces")
                    )
                m = re.fullmatch(r"/v1/namespaces/([^/]+)/tables", path)
                if m:
                    ns = m.group(1)
                    ids = [
                        {"namespace": [ns], "name": t}
                        for (n, t) in sorted(server.tables)
                        if n == ns
                    ]
                    return self._send(200, self._page(ids, "identifiers"))
                m = re.fullmatch(r"/v1/namespaces/([^/]+)/tables/([^/]+)", path)
                if m and (m.group(1), m.group(2)) in server.tables:
                    loc = server.tables[(m.group(1), m.group(2))]
                    return self._send(200, {"metadata-location": loc, "metadata": {}})
                m = re.fullmatch(r"/v1/namespaces/([^/]+)", path)
                if m:
                    ns = m.group(1)
                    if ns in server._ns_names():
                        return self._send(
                            200,
                            {
                                "namespace": ns.split("."),
                                "properties": server.namespaces.get(ns, {}),
                            },
                        )
                self._send(404, {"error": {"message": f"not found: {path}"}})

            def do_DELETE(self):
                path = self.path.split("?")[0]
                if not self._authed():
                    return self._send(401, {"error": {"message": "unauthorized"}})
                m = re.fullmatch(r"/v1/namespaces/([^/]+)/tables/([^/]+)", path)
                if m:
                    key = (m.group(1), m.group(2))
                    if key not in server.tables:
                        return self._send(
                            404, {"error": {"message": f"table {key[0]}.{key[1]} not found"}}
                        )
                    # dropTable: the pointer is forgotten; data/metadata
                    # files stay on disk unless the client purges them
                    # (purgeRequested is advisory for a pointer catalog)
                    del server.tables[key]
                    return self._send(204, None)
                m = re.fullmatch(r"/v1/namespaces/([^/]+)", path)
                if m:
                    ns = m.group(1)
                    if ns not in server._ns_names():
                        return self._send(404, {"error": {"message": f"namespace {ns} not found"}})
                    in_use = any(k[0] == ns for k in server.tables) or any(
                        n != ns and n.startswith(ns + ".") for n in server._ns_names()
                    )
                    if in_use:
                        # spec: dropping a non-empty namespace is a conflict
                        return self._send(
                            409, {"error": {"message": f"namespace {ns} is not empty"}}
                        )
                    server.namespaces.pop(ns, None)
                    return self._send(204, None)
                self._send(404, {"error": {"message": f"not found: {path}"}})

            def do_POST(self):
                path = self.path.split("?")[0]
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n) if n else b"{}"
                if path == "/v1/oauth/tokens":
                    return self._send(200, {"access_token": server.token, "token_type": "bearer"})
                if not self._authed():
                    return self._send(401, {"error": {"message": "unauthorized"}})
                try:
                    body = json.loads(raw.decode("utf-8"))
                except ValueError:
                    import urllib.parse

                    body = {k: v[0] for k, v in urllib.parse.parse_qs(raw.decode()).items()}
                if path == "/v1/namespaces":
                    ns = ".".join(body.get("namespace", []))
                    if not ns:
                        return self._send(400, {"error": {"message": "namespace required"}})
                    if ns in server._ns_names():
                        return self._send(
                            409, {"error": {"message": f"namespace {ns} already exists"}}
                        )
                    server.namespaces[ns] = dict(body.get("properties", {}))
                    return self._send(
                        200,
                        {"namespace": ns.split("."), "properties": server.namespaces[ns]},
                    )
                if path == "/v1/tables/rename":
                    src = body.get("source", {})
                    dst = body.get("destination", {})
                    skey = (".".join(src.get("namespace", [])), src.get("name"))
                    dkey = (".".join(dst.get("namespace", [])), dst.get("name"))
                    if skey not in server.tables:
                        return self._send(
                            404, {"error": {"message": f"table {skey[0]}.{skey[1]} not found"}}
                        )
                    if dkey in server.tables:
                        return self._send(
                            409,
                            {"error": {"message": f"table {dkey[0]}.{dkey[1]} already exists"}},
                        )
                    server.tables[dkey] = server.tables.pop(skey)
                    return self._send(204, None)
                if path == "/v1/transactions/commit":
                    # atomic multi-table commit: stage EVERY table's
                    # requirements+updates against current pointers
                    # first; only if all pass do any pointers move
                    staged = []
                    try:
                        for chg in body.get("table-changes", []):
                            ident = chg.get("identifier", {})
                            ns = ".".join(ident.get("namespace", []))
                            staged.append(server._stage_commit(ns, ident.get("name"), chg))
                    except KeyError as e:
                        return self._send(404, {"error": {"message": str(e)}})
                    except ValueError as e:
                        return self._send(409, {"error": {"message": str(e)}})
                    for key, doc in staged:
                        server._finalize_commit(key, doc)
                    return self._send(204, None)
                m = re.fullmatch(r"/v1/namespaces/([^/]+)/register", path)
                if m:
                    server.tables[(m.group(1), body["name"])] = body["metadata-location"]
                    return self._send(
                        200, {"metadata-location": body["metadata-location"], "metadata": {}}
                    )
                m = re.fullmatch(r"/v1/namespaces/([^/]+)/tables/([^/]+)", path)
                if m:
                    try:
                        return self._send(200, server._apply_commit(m.group(1), m.group(2), body))
                    except KeyError as e:
                        return self._send(404, {"error": {"message": str(e)}})
                    except ValueError as e:
                        return self._send(409, {"error": {"message": str(e)}})
                self._send(404, {"error": {"message": f"not found: {path}"}})

            def log_message(self, *a):
                pass

        return Handler

    def start(self) -> str:
        self._srv = HTTPServer(("127.0.0.1", 0), self._handler())
        threading.Thread(target=self._srv.serve_forever, daemon=True).start()
        return self.uri

    @property
    def uri(self) -> str:
        return f"http://127.0.0.1:{self._srv.server_port}"

    def stop(self) -> None:
        if self._srv:
            self._srv.shutdown()
            self._srv = None
