"""Filesystem ("Hadoop-style") Iceberg catalog — warehouse-rooted tables.

The public Iceberg HadoopCatalog convention: a *warehouse* directory
whose subdirectory levels are namespaces and whose leaf directories are
tables (a directory is a table iff it carries ``metadata/
version-hint.text``). Table identity is the dotted identifier
``ns[.ns2...].table``; resolution is pure path joining, so EVERY
metadata/scan/commit operation from :mod:`.iceberg` applies unchanged to
a catalog-resolved path. This closes the "catalog" half of the round-4
gap (``sources/iceberg.py:44-48``): network catalogs (Hive metastore,
REST) stay out of scope in this sandbox — they are service clients, not
table-format semantics — and this module documents that boundary.

Like the Java HadoopCatalog, ``rename_table`` is NOT supported (the
table's location is its identity; a filesystem rename would break every
absolute path in its own metadata) — it raises with that explanation.

URI form: ``iceberg://<warehouse>::<ns.table>[@<snapshot>]`` — the
``::`` separator distinguishes catalog-resolved identifiers from the
plain-path form ``iceberg://<table_path>`` the jobs already accept;
:func:`resolve_uri` maps either form to a concrete table path.
"""

from __future__ import annotations

import os
import shutil

_HINT = os.path.join("metadata", "version-hint.text")


def _check_ident(ident: str) -> list[str]:
    parts = ident.split(".")
    if not parts or any(not p or "/" in p or p in (".", "..")
                        for p in parts):
        raise ValueError(f"invalid table identifier {ident!r}")
    return parts


class FsCatalog:
    """Warehouse-directory catalog. All methods are metadata-sized: they
    touch directory listings and the per-table version-hint only — never
    data files — so catalog operations stay O(tables), not O(corpus)."""

    def __init__(self, warehouse: str):
        self.warehouse = os.path.abspath(warehouse)
        os.makedirs(self.warehouse, exist_ok=True)

    # -- resolution ---------------------------------------------------
    def table_path(self, ident: str) -> str:
        return os.path.join(self.warehouse, *_check_ident(ident))

    def table_exists(self, ident: str) -> bool:
        return os.path.exists(os.path.join(self.table_path(ident), _HINT))

    def load_table(self, ident: str) -> str:
        """Resolve an identifier to its table path, verifying the table
        exists (the catalog's contract: a load never returns a path that
        a scan would then fail on)."""
        p = self.table_path(ident)
        if not os.path.exists(os.path.join(p, _HINT)):
            raise FileNotFoundError(
                f"no such table {ident!r} in warehouse {self.warehouse}"
            )
        return p

    # -- namespaces ---------------------------------------------------
    def create_namespace(self, namespace: str) -> str:
        p = os.path.join(self.warehouse, *_check_ident(namespace))
        os.makedirs(p, exist_ok=True)
        return p

    def list_namespaces(self, parent: str = "") -> list[str]:
        base = (os.path.join(self.warehouse, *_check_ident(parent))
                if parent else self.warehouse)
        if not os.path.isdir(base):
            return []
        out = []
        for name in sorted(os.listdir(base)):
            p = os.path.join(base, name)
            if os.path.isdir(p) and not os.path.exists(
                os.path.join(p, _HINT)
            ):
                out.append(f"{parent}.{name}" if parent else name)
        return out

    def list_tables(self, namespace: str) -> list[str]:
        base = os.path.join(self.warehouse, *_check_ident(namespace))
        if not os.path.isdir(base):
            return []
        return sorted(
            f"{namespace}.{name}"
            for name in os.listdir(base)
            if os.path.exists(os.path.join(base, name, _HINT))
        )

    # -- table lifecycle ----------------------------------------------
    def create_table(self, ident: str, spark_schema,
                     partition_by: list[str] | None = None) -> str:
        from . import iceberg as ICE

        p = self.table_path(ident)
        if os.path.exists(os.path.join(p, _HINT)):
            raise FileExistsError(f"table {ident!r} already exists")
        ICE.create_table(p, spark_schema, partition_by=partition_by)
        return p

    def drop_table(self, ident: str, purge: bool = False) -> None:
        """Drop from the catalog. ``purge=False`` removes only the
        metadata directory (the Iceberg DROP TABLE default — data files
        may be shared by other snapshots/tables); ``purge=True`` removes
        the whole table directory."""
        p = self.load_table(ident)
        shutil.rmtree(p if purge else os.path.join(p, "metadata"))

    def rename_table(self, src: str, dst: str) -> None:
        raise NotImplementedError(
            "filesystem catalogs cannot rename tables: the table location "
            "IS the identity and its metadata stores absolute paths "
            "(same restriction as Iceberg's HadoopCatalog)"
        )


def resolve_uri(uri: str) -> tuple[str, str]:
    """``iceberg://...`` URI -> ``(table_path, snapshot_selector)``.

    Accepts both the plain-path form ``iceberg://<table_path>[@snap]``
    and the catalog form ``iceberg://<warehouse>::<ns.table>[@snap]``;
    ``snap`` is passed through (empty string when absent)."""
    if not uri.startswith("iceberg://"):
        raise ValueError(f"not an iceberg URI: {uri!r}")
    body, _, snap = uri[len("iceberg://"):].partition("@")
    wh, sep, ident = body.partition("::")
    if not sep:
        return body, snap
    return FsCatalog(wh).load_table(ident), snap
