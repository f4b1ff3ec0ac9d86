"""Remote file access: HTTP(S) byte-range reads, cloud-store URLs.

API parity with the reference's ``remote.py:31-256`` (``is_remote_url``,
``RemoteFile.read_range/read_all/download_to_temp``, module helpers), same
behaviors: HEAD for size + Accept-Ranges, ``Range: bytes=a-b`` GETs with a
200-fallback slice, exclusive-end conversion for cloud stores.  Cloud schemes
(s3/az/gs) are gated on ``obstore`` availability exactly like the reference;
this deployment image ships without it, so those degrade to a clear
ImportError while HTTP paths work out of the box.
"""

from __future__ import annotations

import logging
import tempfile
from pathlib import Path
from typing import Optional, Tuple, Union
from urllib.parse import urlparse

logger = logging.getLogger("flac_raster_tpu.remote")

__all__ = [
    "is_remote_url",
    "parse_cloud_url",
    "RemoteFile",
    "open_remote",
    "read_remote_range",
    "download_remote",
    "OBSTORE_AVAILABLE",
]

try:
    from obstore.store import AzureStore, GCSStore, S3Store  # type: ignore

    OBSTORE_AVAILABLE = True
except ImportError:
    OBSTORE_AVAILABLE = False


def is_remote_url(path: Union[str, Path]) -> bool:
    if isinstance(path, Path):
        return False
    return str(path).startswith(("http://", "https://", "s3://", "az://", "gs://"))


def get_url_scheme(url: str) -> str:
    return urlparse(url).scheme.lower()


def parse_cloud_url(url: str) -> Tuple[str, str, str]:
    """s3://bucket/key -> (scheme, bucket, key)."""
    parsed = urlparse(url)
    return parsed.scheme.lower(), parsed.netloc, parsed.path.lstrip("/")


def cloud_url_to_https(url: str) -> str:
    """Map a cloud URL to the provider's public (unsigned) HTTPS endpoint."""
    scheme, bucket, key = parse_cloud_url(url)
    if scheme == "s3":
        return f"https://{bucket}.s3.amazonaws.com/{key}"
    if scheme == "gs":
        return f"https://storage.googleapis.com/{bucket}/{key}"
    if scheme == "az":
        # az://container/path needs an account; the reference's obstore path
        # reads the account from env -- mirror that for the public endpoint
        import os

        account = os.environ.get("AZURE_STORAGE_ACCOUNT_NAME", "")
        if not account:
            raise ValueError(
                "az:// URLs need AZURE_STORAGE_ACCOUNT_NAME (or obstore)"
            )
        return f"https://{account}.blob.core.windows.net/{bucket}/{key}"
    raise ValueError(f"not a cloud URL: {url}")


class RemoteFile:
    """Byte-range reader over http(s)/s3/az/gs URLs."""

    def __init__(self, url: str, session=None):
        self.url = url
        self.scheme = get_url_scheme(url)
        self._store = None
        self._key = None
        self._file_size: Optional[int] = None
        self._supports_range = True
        self._session = session
        if self.scheme in ("http", "https"):
            self._init_http()
        elif self.scheme in ("s3", "az", "gs"):
            self._init_cloud()
        else:
            raise ValueError(f"Unsupported URL scheme: {self.scheme}")

    def _requests(self):
        if self._session is not None:
            return self._session
        import requests

        return requests

    def _init_http(self):
        try:
            response = self._requests().head(self.url, timeout=10)
            response.raise_for_status()
            self._file_size = int(response.headers.get("content-length", 0)) or None
            self._supports_range = (
                "bytes" in response.headers.get("accept-ranges", "").lower()
            )
        except Exception as e:  # noqa: BLE001 -- degrade like the reference
            logger.warning("failed to get file info: %s", e)
            self._supports_range = True

    def _init_cloud(self):
        if not OBSTORE_AVAILABLE:
            # Public buckets are reachable without obstore via the provider's
            # HTTPS endpoint (unsigned requests).  Credentialed access still
            # needs obstore, matching the reference's optional dependency.
            https = cloud_url_to_https(self.url)
            logger.info("obstore unavailable; using public endpoint %s", https)
            self.url = https
            self.scheme = get_url_scheme(https)
            self._init_http()
            return
        scheme, bucket, self._key = parse_cloud_url(self.url)
        if scheme == "s3":
            self._store = S3Store(bucket=bucket)
        elif scheme == "az":
            self._store = AzureStore(container=bucket)
        else:
            self._store = GCSStore(bucket=bucket)

    @property
    def file_size(self) -> Optional[int]:
        if self._file_size is not None:
            return self._file_size
        if self._store is not None:
            try:
                self._file_size = self._store.head(self._key).size
            except Exception as e:  # noqa: BLE001
                logger.warning("failed to get cloud file size: %s", e)
        return self._file_size

    def read_range(self, start: int, end: int) -> bytes:
        """Read inclusive byte range [start, end]."""
        if self.scheme in ("http", "https"):
            return self._read_http_range(start, end)
        return self._read_cloud_range(start, end)

    def _read_http_range(self, start: int, end: int) -> bytes:
        headers = {"Range": f"bytes={start}-{end}"}
        response = self._requests().get(self.url, headers=headers, timeout=60)
        if response.status_code == 206:
            return response.content
        if response.status_code == 200:
            logger.warning("server returned full content, extracting range")
            return response.content[start : end + 1]
        response.raise_for_status()
        return response.content

    def _read_cloud_range(self, start: int, end: int) -> bytes:
        if self._store is None:
            raise RuntimeError("cloud store not initialized")
        return bytes(self._store.get_range(self._key, start=start, end=end + 1))

    def read_all(self) -> bytes:
        if self.scheme in ("http", "https"):
            response = self._requests().get(self.url, timeout=120)
            response.raise_for_status()
            return response.content
        if self._store is None:
            raise RuntimeError("cloud store not initialized")
        return bytes(self._store.get(self._key))

    def download_to_temp(self) -> Path:
        suffix = Path(urlparse(self.url).path).suffix or ".tmp"
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as tmp:
            tmp.write(self.read_all())
            return Path(tmp.name)


def open_remote(url: str) -> RemoteFile:
    return RemoteFile(url)


def read_remote_range(url: str, start: int, end: int) -> bytes:
    return RemoteFile(url).read_range(start, end)


def download_remote(url: str, output_path: Optional[Path] = None) -> Path:
    remote = RemoteFile(url)
    if output_path is None:
        return remote.download_to_temp()
    data = remote.read_all()
    output_path = Path(output_path)
    output_path.parent.mkdir(parents=True, exist_ok=True)
    output_path.write_bytes(data)
    return output_path
