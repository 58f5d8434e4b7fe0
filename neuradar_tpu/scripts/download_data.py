"""Dataset download CLI (`ns-download-data` parity).

cf. reference nerfstudio/scripts/downloads/download_data.py:40-580 and
eyeful_tower.py. The reference implements one bespoke class per dataset
(gdown / curl / awscli subprocesses); here the same command surface is a
single data-driven registry — each capture is an (url, archive kind,
placement rule) row — and one generic fetch/unpack routine, so the plumbing
is testable offline via file:// URLs (this image has no egress; real
downloads work wherever the package runs with network access).

Usage:
  python -m neuradar_tpu.scripts.download_data blender --save-dir data/
  python -m neuradar_tpu.scripts.download_data nerfstudio --capture-name poster
  python -m neuradar_tpu.scripts.download_data phototourism --capture-name all
"""

from __future__ import annotations

import argparse
import dataclasses
import re
import shutil
import sys
import tarfile
import urllib.request
import zipfile
from pathlib import Path
from typing import Dict, Optional

_GDRIVE = "https://drive.google.com/uc?export=download&id="


@dataclasses.dataclass(frozen=True)
class Capture:
    """One downloadable capture.

    Placement semantics (matching the reference's per-dataset behavior):
    * strip_inner: the archive holds exactly one top-level folder — move its
      contents to ``save_dir/<dataset>/<name>`` (download_capture_name).
    * rename_from: the archive extracts to ``save_dir/<rename_from>`` which
      is renamed to ``save_dir/<dataset>`` (blender/sitcoms3d/dnerf style).
    * neither: extract directly into ``save_dir/<dataset>/<name>``.
    """

    url: str
    kind: str = "zip"  # zip | tar | tar.gz
    strip_inner: bool = False
    rename_from: Optional[str] = None


def gdrive(file_id: str) -> str:
    return _GDRIVE + file_id


# fmt: off
NERFSTUDIO_CAPTURES = {
    "bww_entrance": "1ylkRHtfB3n3IRLf2wplpfxzPTq7nES9I", "campanile": "13aOfGJRRH05pOOk9ikYGTwqFc2L1xskU",
    "desolation": "14IzOOQm9KBJ3kPbunQbUTHPnXnmZus-f", "library": "1Hjbh_-BuaWETQExn2x2qGD74UwrFugHx",
    "poster": "1dmjWGXlJnUxwosN6MVooCDQe970PkD-1", "redwoods2": "1rg-4NoXT8p6vkmbWxMOY6PSG4j3rfcJ8",
    "storefront": "16b792AguPZWDA_YC4igKCwXJqW0Tb21o", "vegetation": "1wBhLQ2odycrtU39y2akVurXEAt9SsVI3",
    "Egypt": "1YktD85afw7uitC3nPamusk0vcBdAfjlF", "person": "1HsGMwkPu-R7oU7ySMdoo6Eppq8pKhHF3",
    "kitchen": "1IRmNyNZSNFidyj93Tt5DtaEU9h6eJdi1", "plane": "1tnv2NC2Iwz4XRYNtziUWvLJjObkZNo2D",
    "dozer": "1jQJPz5PhzTH--LOcCxvfzV_SDLEp1de3", "floating-tree": "1mVEHcO2ep13WPx92IPDvdQg66vLQwFSy",
    "aspen": "1X1PQcji_QpxGfMxbETKMeK8aOnWCkuSB", "stump": "1yZFAAEvtw2hs4MXrrkvhVAzEliLLXPB7",
    "sculpture": "1CUU_k0Et2gysuBn_R5qenDMfYXEhNsd1", "Giannini-Hall": "1UkjWXLN4qybq_a-j81FsTKghiXw39O8E",
}
# SIGGRAPH-2023 paper subset (reference `--capture-name nerfstudio-dataset`)
NERFSTUDIO_DATASET_GROUP = ["Egypt", "person", "kitchen", "plane", "dozer",
                            "floating-tree", "aspen", "stump", "sculpture", "Giannini-Hall"]

_PT = "https://www.cs.ubc.ca/research/kmyi_data/imw2020/TrainingData/"
_SDF = "https://s3.eu-central-1.amazonaws.com/avg-projects/monosdf/data/"
_OSR = ("https://nextcloud.mpi-klsb.mpg.de/index.php/s/mGXYKpD8raQ8nMk/download"
        "?path=%2FData&files={name}&downloadStartSecret={secret}")

REGISTRY: Dict[str, Dict[str, Capture]] = {
    "blender": {"": Capture(gdrive("18JxhpWD-4ZmuFKLzKlAw-w5PpzZxXOcG"), rename_from="nerf_synthetic")},
    "sitcoms3d": {"": Capture(gdrive("1sgKr0ZO7BQC0FYinAnRSxobIWNucAST5"), rename_from="friends")},
    "dnerf": {"": Capture("https://www.dropbox.com/s/raw/0bf6fl0ye2vz3vr/data.zip", rename_from="data")},
    "nerfstudio": {name: Capture(gdrive(fid), strip_inner=True) for name, fid in NERFSTUDIO_CAPTURES.items()},
    "record3d": {"bear": Capture(gdrive("1WRZohWMRj0nNlYFIEBwkddDoGPvLTzkR"), strip_inner=True)},
    "phototourism": {
        name: Capture(_PT + fname + ".tar.gz", kind="tar.gz", strip_inner=True)
        for name, fname in {
            "brandenburg-gate": "brandenburg_gate", "buckingham-palace": "buckingham_palace",
            "colosseum-exterior": "colosseum_exterior", "grand-palace-brussels": "grand_place_brussels",
            "notre-dame-facade": "notre_dame_front_facade", "westminster-palace": "palace_of_westminster",
            "pantheon-exterior": "pantheon_exterior", "taj-mahal": "taj_mahal",
            "temple-nara": "temple_nara_japan", "trevi-fountain": "trevi_fountain",
        }.items()
    },
    "sdfstudio": {
        **{name: Capture(_SDF + fname + ".tar", kind="tar", strip_inner=True)
           for name, fname in {
               "sdfstudio-demo-data": "sdfstudio-demo-data", "dtu": "DTU", "replica": "Replica",
               "scannet": "scannet", "tanks-and-temple": "tnt_advanced",
               "tanks-and-temple-highres": "highresTNT", "heritage": "Heritage-Recon",
           }.items()},
        "neural-rgbd-data": Capture("http://kaldir.vc.in.tum.de/neural_rgbd/neural_rgbd_data.zip"),
    },
    "nerfosr": {
        name: Capture(_OSR.format(name=name, secret=secret), strip_inner=True)
        for name, secret in {
            "europa": "0k2r95c1fdej", "lk2": "w8kuvjzmchc", "lwp": "gtnc4vmkcjq",
            "rathaus": "7372aewy6rr", "schloss": "y8t00nqx0h", "st": "kl9ptuxe8v",
            "stjacob": "sntsim6ebvm", "stjohann": "g80ug1fsbmh", "trevi": "ot1483bigjm",
        }.items()
    },
    "mill19": {
        name: Capture(f"https://storage.cmusatyalab.org/mega-nerf-data/{name}-pixsfm.tgz",
                      kind="tar.gz", strip_inner=True)
        for name in ("building", "rubble")
    },
}
# fmt: on


def _fetch(url: str, dest: Path) -> None:
    """Download url -> dest. Google Drive large-file confirmation pages are
    followed by re-requesting with the confirm token (what gdown does)."""
    dest.parent.mkdir(parents=True, exist_ok=True)
    req = urllib.request.Request(url, headers={"User-Agent": "neuradar-tpu/ns-download-data"})
    with urllib.request.urlopen(req) as resp:
        head = resp.read(4096)
        ctype = resp.headers.get("Content-Type", "")
        if url.startswith(_GDRIVE) and "text/html" in ctype:
            body = head + resp.read()
            m = re.search(rb"confirm=([0-9A-Za-z_-]+)", body)
            token = m.group(1).decode() if m else "t"
            return _fetch(f"{url}&confirm={token}", dest)
        with open(dest, "wb") as f:
            f.write(head)
            shutil.copyfileobj(resp, f)


def _extract(archive: Path, kind: str, into: Path) -> None:
    into.mkdir(parents=True, exist_ok=True)
    if kind == "zip":
        with zipfile.ZipFile(archive) as z:
            z.extractall(into)
    else:  # tar / tar.gz — tarfile sniffs compression with mode "r:*"
        with tarfile.open(archive, "r:*") as t:
            t.extractall(into)


def download_capture(dataset: str, name: str, cap: Capture, save_dir: Path) -> Path:
    """Fetch + unpack one capture; returns the final dataset path."""
    tmp = save_dir / f".tmp_{dataset}_{name or dataset}"
    shutil.rmtree(tmp, ignore_errors=True)
    suffix = {"zip": ".zip", "tar": ".tar", "tar.gz": ".tar.gz"}[cap.kind]
    archive = save_dir / f"{dataset}_{name or 'data'}{suffix}"
    print(f"[download] {dataset}/{name or dataset}: {cap.url}")
    _fetch(cap.url, archive)
    try:
        if cap.rename_from is not None:
            # archive carries its own top-level folder name -> save_dir/<dataset>
            target = save_dir / dataset
            shutil.rmtree(target, ignore_errors=True)
            _extract(archive, cap.kind, save_dir)
            (save_dir / cap.rename_from).rename(target)
            return target
        target = save_dir / dataset / name
        if cap.strip_inner:
            _extract(archive, cap.kind, tmp)
            inner = [p for p in tmp.iterdir() if not p.name.startswith(".")]
            if len(inner) != 1 or not inner[0].is_dir():
                raise RuntimeError(f"expected one top-level folder in {archive.name}, got {inner}")
            shutil.rmtree(target, ignore_errors=True)
            target.parent.mkdir(parents=True, exist_ok=True)
            shutil.move(str(inner[0]), str(target))
        else:
            _extract(archive, cap.kind, target)
        return target
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        archive.unlink(missing_ok=True)


def captures_for(dataset: str, capture_name: str) -> Dict[str, Capture]:
    table = REGISTRY[dataset]
    if capture_name == "all":
        return dict(table)
    if dataset == "nerfstudio" and capture_name == "nerfstudio-dataset":
        return {n: table[n] for n in NERFSTUDIO_DATASET_GROUP}
    if capture_name not in table:
        raise SystemExit(f"unknown capture {capture_name!r} for {dataset}: choices are "
                         f"{sorted(table)} (or 'all')")
    return {capture_name: table[capture_name]}


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset", choices=[*REGISTRY.keys(), "eyefultower"])
    parser.add_argument("--save-dir", type=Path, default=Path("data/"))
    parser.add_argument("--capture-name", default=None,
                        help="capture within the dataset, or 'all' (datasets with a single "
                             "archive ignore this)")
    args = parser.parse_args(argv)

    if args.dataset == "eyefultower":
        # reference eyeful_tower.py drives `awscli` against a public S3 bucket;
        # exposing the same pointer is more honest than reimplementing awscli
        print("eyefultower is served from s3://fb-baas-f32eacb9-8abb-11eb-b2b8-4857dd089e15/"
              "EyefulTower/ — install awscli and sync the capture folder "
              "(cf. reference nerfstudio/scripts/downloads/eyeful_tower.py)", file=sys.stderr)
        return 2

    table = REGISTRY[args.dataset]
    default = "" if "" in table else next(iter(table))
    name = args.capture_name if args.capture_name is not None else default
    args.save_dir.mkdir(parents=True, exist_ok=True)
    for cap_name, cap in captures_for(args.dataset, name).items():
        path = download_capture(args.dataset, cap_name, cap, args.save_dir)
        print(f"[download] done: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
