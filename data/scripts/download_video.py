#!/usr/bin/env python3
"""Sample-data fetchers: a zip-bundle downloader (requests) and a YouTube
downloader (yt-dlp).

Parity with the reference tools data/scripts/download_video.py:1-50
(Dropbox zip fetch + extract) and the download_video() helper in
data/scripts/extract_keypoints_mediapipe.py:160-174 (yt-dlp). Both network
dependencies are optional; this environment has no egress, so these exist
for API parity and external deployments.
"""

from __future__ import annotations

import os
import sys
import zipfile


def download_file(url: str, output_path: str) -> str:
    import requests  # optional dependency

    os.makedirs(os.path.dirname(os.path.abspath(output_path)), exist_ok=True)
    with requests.get(url, stream=True, timeout=60) as resp:
        resp.raise_for_status()
        with open(output_path, "wb") as f:
            for chunk in resp.iter_content(1 << 16):
                f.write(chunk)
    return output_path


def unzip_file(zip_path: str, extract_to: str) -> None:
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(extract_to)
    os.remove(zip_path)
    print(f"Unzipped to: {extract_to}")


def download_youtube(url: str, output_dir: str = "data/videos") -> str:
    try:
        import yt_dlp  # type: ignore
    except ImportError as e:
        raise RuntimeError("yt-dlp is not available in this environment") from e
    opts = {
        "format": "bv[ext=mp4][vcodec^=avc1]+ba/b[ext=mp4][vcodec^=avc1]",
        "merge_output_format": "mp4",
        "outtmpl": f"{output_dir}/%(title)s.%(ext)s",
        "quiet": False,
    }
    with yt_dlp.YoutubeDL(opts) as ydl:
        info = ydl.extract_info(url, download=True)
        filename = ydl.prepare_filename(info)
        return os.path.splitext(filename)[0] + ".mp4"


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) < 1:
        print("Usage: download_video.py <url> [out_zip_or_dir]")
        return 1
    url = argv[0]
    if "youtube" in url or "youtu.be" in url:
        print(download_youtube(url, argv[1] if len(argv) > 1 else "data/videos"))
    else:
        out = argv[1] if len(argv) > 1 else "data/data_bundle.zip"
        download_file(url, out)
        unzip_file(out, os.path.dirname(out) or ".")
    return 0


if __name__ == "__main__":
    sys.exit(main())
