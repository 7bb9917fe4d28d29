"""Package the boltspark source as a zip for spark-submit --py-files /
SparkContext.addPyFile, so executors can import the kernels anywhere
(multi-executor clusters have no shared filesystem with the driver)."""

from __future__ import annotations

import os
import tempfile
import zipfile


def build_package_zip(dest_dir: str | None = None) -> str:
    import boltspark

    pkg_root = os.path.dirname(os.path.abspath(boltspark.__file__))
    dest_dir = dest_dir or tempfile.mkdtemp(prefix="boltspark_ship_")
    zip_path = os.path.join(dest_dir, "boltspark.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join("boltspark", os.path.relpath(full, pkg_root))
                zf.write(full, rel)
    return zip_path


def ship_package(spark) -> str:
    """addPyFile the package zip to a live session; returns the zip path."""
    zip_path = build_package_zip()
    spark.sparkContext.addPyFile(zip_path)
    return zip_path
