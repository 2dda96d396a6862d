"""Small file utilities — parity with the reference's FileUtilities.

ref: src/Utilities/FileUtilities.cpp:29-223. Python's stdlib does most
of this; the functions exist so every reference capability has a named
home (SURVEY.md §2.8).
"""

from __future__ import annotations

import os
import re
from typing import Callable, Optional


def match_file_name(
    prefix: str, index: int, suffix: str, extension: str, name: str
) -> bool:
    """True if ``name`` == prefix + zero-padded 5-digit index + suffix +
    '.' + extension (ref: match_file_name FileUtilities.cpp:29-83, which
    hand-rolls this because the author avoided std::regex)."""
    expected = f"{prefix}{index:05d}{suffix}.{extension}"
    return name == expected


def files_in_directory(
    directory: str, predicate: Optional[Callable[[str], bool]] = None
) -> list[str]:
    """Sorted file names in a directory, optionally filtered
    (ref: FileUtilities.cpp files_in_directory)."""
    names = sorted(
        f
        for f in os.listdir(directory)
        if os.path.isfile(os.path.join(directory, f))
    )
    if predicate is not None:
        names = [f for f in names if predicate(f)]
    return names


def process_file_by_lines(
    path: str, handler: Callable[[str], None]
) -> None:
    """Call handler per stripped line (ref: FileUtilities.cpp:92-116)."""
    with open(path) as f:
        for line in f:
            handler(line.rstrip("\n"))


def read_last_line(path: str) -> Optional[str]:
    """Last non-empty line of a text file
    (ref: read_last_line FileUtilities.cpp:176-223)."""
    last = None
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if line:
                last = line
    return last


def file_exists(path: str) -> bool:
    return os.path.isfile(path)
