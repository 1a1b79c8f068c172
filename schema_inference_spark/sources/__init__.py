from .catalog import SnapshotCatalog  # noqa: F401
from .transcripts import generate_fixture_snapshots, generate_turns, write_snapshot  # noqa: F401
