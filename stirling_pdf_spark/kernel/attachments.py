"""Attachment naming semantics (E11/E12).

Reproduces the reference's AttachmentService:
  * name fallback chain unicodeName -> fileName -> file -> key
    (AttachmentService.java:429-445): our raw attachment span carries a
    single (possibly empty) name; the fallback is the media_ref-derived
    synthetic name ``attachment-{sha8}``;
  * duplicate names get unique suffixes ``base_1.ext``, ``base_2.ext``
    (AttachmentService.java:454-472);
  * traversal order is the embedded-file name-tree walk order
    (:388-407, LinkedHashMap at :145-146) — i.e. raw offset order.
"""

from __future__ import annotations


def fallback_name(name: str, media_ref: str) -> str:
    if name:
        return name
    suffix = media_ref.rsplit("-", 1)[-1] if media_ref else "unknown"
    return f"attachment-{suffix}"


def unique_names(names: list[str]) -> list[str]:
    """First occurrence keeps its name; later duplicates become
    ``base_N.ext`` (N counts per original name, starting at 1)."""
    seen: dict[str, int] = {}
    taken: set[str] = set()
    out: list[str] = []
    for name in names:
        if name not in seen and name not in taken:
            seen[name] = 0
            taken.add(name)
            out.append(name)
            continue
        base, dot, ext = name.rpartition(".")
        if not dot:
            base, ext = name, ""
        n = seen.get(name, 0)
        while True:
            n += 1
            candidate = f"{base}_{n}.{ext}" if ext else f"{base}_{n}"
            if candidate not in taken:
                break
        seen[name] = n
        taken.add(candidate)
        out.append(candidate)
    return out
