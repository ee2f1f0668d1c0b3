"""Fetch + archive extraction sources — SURVEY S1/S2.

The reference stages every input through a download-with-retry step
(``/root/reference/src/files/download.py:33-76`` — 10 attempts, fixed
backoff, skip-if-already-downloaded) and decompresses staged archives
(``src/files/gzip_file.py:14-22``, ``tar_file.py:17-56`` — member
filtering + bounded read retries, ``zip_file.py:17-26``).

Here the same contracts, sandbox-shaped: ``file://``/local paths are the
exercised transport (the sandbox has no network); ``http(s)://`` uses
stdlib urllib when available.  Extraction is driver/worker-local staging
— the Ray-side surface is ``read_extracted``: stage the archive once,
then ``ray.data.read_*`` over the extracted members (block-parallel).
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import time
import zipfile
from collections.abc import Callable

import ray.data


class FetchError(RuntimeError):
    pass


def fetch_with_retry(
    url: str,
    dest: str,
    retries: int = 10,
    backoff_s: float = 6.0,
    skip_if_exists: bool = True,
    _sleep: Callable[[float], None] = time.sleep,
) -> str:
    """Stage ``url`` at ``dest`` (tmp→rename), retrying like the reference
    (download.py:44-66: N attempts, fixed backoff, existing file wins)."""
    if skip_if_exists and os.path.exists(dest):
        return dest
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    last: Exception | None = None
    for attempt in range(retries):
        try:
            tmp = f"{dest}.tmp.{os.getpid()}"
            if url.startswith(("http://", "https://")):  # pragma: no cover - no network
                import urllib.request

                with urllib.request.urlopen(url) as r, open(tmp, "wb") as out:
                    shutil.copyfileobj(r, out)
            else:
                src = url[len("file://"):] if url.startswith("file://") else url
                with open(src, "rb") as r, open(tmp, "wb") as out:
                    shutil.copyfileobj(r, out)
            os.replace(tmp, dest)
            return dest
        except OSError as e:
            last = e
            if attempt < retries - 1:
                _sleep(backoff_s)
    raise FetchError(f"fetch failed after {retries} attempts: {url}") from last


def extract_archive(
    path: str,
    dest_dir: str,
    member_filter: Callable[[str], bool] | None = None,
    read_retries: int = 3,
    _sleep: Callable[[float], None] = time.sleep,
) -> list[str]:
    """Decompress ``path`` into ``dest_dir``; returns extracted file paths.

    - ``.zip`` → all (filtered) members (zip_file.py:17-26)
    - ``.tar`` / ``.tar.gz`` / ``.tgz`` → filtered members with bounded
      read retries per member (tar_file.py:30-52's retry loop)
    - ``.gz`` (single member) → the decompressed file (gzip_file.py:14-22)
    """
    os.makedirs(dest_dir, exist_ok=True)
    out: list[str] = []
    if path.endswith(".zip"):
        with zipfile.ZipFile(path) as zf:
            for name in zf.namelist():
                if name.endswith("/") or (member_filter and not member_filter(name)):
                    continue
                target = os.path.join(dest_dir, os.path.basename(name))
                with zf.open(name) as src, open(target, "wb") as dst:
                    shutil.copyfileobj(src, dst)
                out.append(target)
    elif path.endswith((".tar", ".tar.gz", ".tgz")):
        with tarfile.open(path) as tf:
            for member in tf.getmembers():
                if not member.isfile():
                    continue
                if member_filter and not member_filter(member.name):
                    continue
                target = os.path.join(dest_dir, os.path.basename(member.name))
                last: Exception | None = None
                for attempt in range(read_retries):
                    try:
                        src = tf.extractfile(member)
                        assert src is not None
                        with src, open(target, "wb") as dst:
                            shutil.copyfileobj(src, dst)
                        break
                    except OSError as e:  # pragma: no cover - transient I/O
                        last = e
                        if attempt == read_retries - 1:
                            raise
                        _sleep(1.0)
                out.append(target)
    elif path.endswith(".gz"):
        target = os.path.join(dest_dir, os.path.basename(path)[:-3])
        with gzip.open(path, "rb") as src, open(target, "wb") as dst:
            shutil.copyfileobj(src, dst)
        out.append(target)
    else:
        raise ValueError(f"unsupported archive: {path}")
    return out


def read_extracted(
    url: str,
    staging_dir: str,
    reader: Callable[[list[str]], "ray.data.Dataset"] | None = None,
    member_filter: Callable[[str], bool] | None = None,
) -> "ray.data.Dataset":
    """fetch → extract → Dataset.  ``reader`` defaults to
    ``ray.data.read_text`` over all extracted members."""
    archive = fetch_with_retry(url, os.path.join(staging_dir, os.path.basename(url)))
    files = extract_archive(archive, os.path.join(staging_dir, "extracted"),
                            member_filter=member_filter)
    if reader is None:
        return ray.data.read_text(files)
    return reader(files)
