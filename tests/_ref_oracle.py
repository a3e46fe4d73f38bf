"""Scoped imports of reference-tree oracle modules.

Parity tests import modules from /root/reference (PUBLIC, read-only) as
behavioral oracles. A bare module-level ``sys.path.insert(0, REF)`` leaks:
the reference tree then shadows repo modules for every later test in the
same pytest process (its top-level ``utils`` package in particular).
``ref_import`` keeps the path insertion scoped to the import itself —
imported oracle modules stay cached in sys.modules (their internal
absolute imports already resolved), but sys.path is restored immediately.
"""

from __future__ import annotations

import contextlib
import importlib
import sys

REFERENCE = "/root/reference"


@contextlib.contextmanager
def reference_on_path(path: str = REFERENCE):
    sys.path.insert(0, path)
    try:
        yield
    finally:
        with contextlib.suppress(ValueError):
            sys.path.remove(path)


def ref_import(name: str, path: str = REFERENCE):
    """Import a module from the reference tree without leaking sys.path."""
    with reference_on_path(path):
        return importlib.import_module(name)
