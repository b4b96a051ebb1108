"""Reference-API-compatible stateful objects + streaming dedup stages.

Exports the six-class surface of the reference (src/lib.rs:35-43) plus the
Ray-side streaming stages.
"""

from .dedup import CMinHashDeduplicator, RMinHashDeduplicator, default_num_bands
from .lsh import RMinHashLSH
from .minhash import CMinHash, RMinHash, RMinHashDigestMatrix, token_hashes_of
from .stream import StreamingDedupStage, incremental_dedup_against_checkpoint

__all__ = [
    "RMinHash", "CMinHash", "RMinHashDigestMatrix", "RMinHashLSH",
    "RMinHashDeduplicator", "CMinHashDeduplicator", "default_num_bands",
    "token_hashes_of", "StreamingDedupStage",
    "incremental_dedup_against_checkpoint",
]
