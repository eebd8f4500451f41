"""Plan/metadata facade — snapshot catalog, checkpoint manifests,
compaction (the Iceberg-shaped layer; SURVEY.md §7.0)."""

from ..catalog import SnapshotCatalog  # noqa: F401
