"""URL-or-path opener with local caching.

Parity target: dnnlib/util.py:397-460 (``open_url``) and
:125-133 (``make_cache_dir_path``) — every checkpoint/detector path in
the reference accepts either a filesystem path or a URL; downloads are
cached under ``~/.cache/dnnlib`` keyed by the URL's md5. Here the cache
root is ``~/.cache/layoutdetr_tpu`` (override via
``LAYOUTDETR_TPU_CACHE_DIR``).

stdlib urllib instead of requests; same retry-with-backoff contract.
"""

from __future__ import annotations

import hashlib
import io
import os
import re
import time
import urllib.parse
import urllib.request
import uuid
from typing import Union


def make_cache_dir_path(*paths: str) -> str:
    root = os.environ.get(
        "LAYOUTDETR_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "layoutdetr_tpu"),
    )
    path = os.path.join(root, *paths)
    os.makedirs(path, exist_ok=True)
    return path


def is_url(obj: Union[str, os.PathLike], allow_file_urls: bool = False) -> bool:
    """True for http(s):// (and optionally file://) strings (dnnlib
    util.py:380-394 semantics, minus the Google-Drive special case)."""
    if not isinstance(obj, str):
        return False
    if allow_file_urls and obj.startswith("file://"):
        return True
    try:
        parsed = urllib.parse.urlparse(obj)
        return parsed.scheme in ("http", "https") and bool(parsed.netloc)
    except Exception:
        return False


def open_url(url: str, cache_dir: str = None, num_attempts: int = 10,
             verbose: bool = True, return_filename: bool = False, cache: bool = True):
    """Open a URL or a local path; downloads are cached.

    Returns a binary file-like object, or the local filename when
    ``return_filename=True`` (parity: dnnlib/util.py:397-460).
    """
    assert num_attempts >= 1
    assert not (return_filename and not cache)

    # Local path (or file:// URL) -> open directly.
    if url.startswith("file://"):
        url = urllib.request.url2pathname(urllib.parse.urlparse(url).path)
    if not is_url(url):
        if return_filename:
            return url
        return open(url, "rb")

    url_md5 = hashlib.md5(url.encode("utf-8")).hexdigest()
    if cache_dir is None:
        cache_dir = make_cache_dir_path("downloads")

    if cache:
        import glob

        cache_files = glob.glob(os.path.join(cache_dir, url_md5 + "_*"))
        if cache_files:
            filename = cache_files[0]
            return filename if return_filename else open(filename, "rb")

    url_data = None
    url_name = None
    for attempt in range(num_attempts):
        try:
            with urllib.request.urlopen(url, timeout=60) as res:
                url_data = res.read()
                cd = res.headers.get("Content-Disposition", "")
                m = re.search(r'filename="?([^";]+)"?', cd)
                url_name = m.group(1) if m else os.path.basename(
                    urllib.parse.urlparse(url).path) or "download"
            break
        except KeyboardInterrupt:
            raise
        except Exception:
            if attempt == num_attempts - 1:
                raise
            if verbose:
                print(f"open_url: attempt {attempt + 1} failed, retrying...")
            time.sleep(min(2 ** attempt, 30))

    if cache:
        safe_name = re.sub(r"[^0-9a-zA-Z-._]", "_", url_name)
        cache_file = os.path.join(cache_dir, f"{url_md5}_{safe_name}")
        temp_file = os.path.join(cache_dir, f"tmp_{uuid.uuid4().hex}_{url_md5}_{safe_name}")
        with open(temp_file, "wb") as f:
            f.write(url_data)
        os.replace(temp_file, cache_file)  # atomic
        if return_filename:
            return cache_file

    return io.BytesIO(url_data)
