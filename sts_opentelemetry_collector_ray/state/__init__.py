from .manifest import (
    fingerprint_files,
    load_manifest,
    manifest_path,
    ruleset_fingerprint,
    write_manifest,
)

__all__ = [
    "fingerprint_files",
    "load_manifest",
    "manifest_path",
    "ruleset_fingerprint",
    "write_manifest",
]
