"""csdr-package bundler (cabal2appimage analogue)."""

import os
import subprocess
import sys
import zipfile

from csdr_tpu.apps.package_app import build_bundle


def test_build_bundle(tmp_path):
    out = build_bundle(str(tmp_path / "dist"))
    pyz = os.path.join(out, "csdr.pyz")
    assert os.path.exists(pyz)
    assert os.path.exists(os.path.join(out, "csdr"))
    with zipfile.ZipFile(pyz) as z:
        names = z.namelist()
        assert "__main__.py" in names
        assert any(n.startswith("csdr_tpu/apps/soapy_sdr_cli") for n in names)
    # launcher usage line works without jax initialization
    r = subprocess.run([sys.executable, pyz, "unknown-prog"],
                       capture_output=True, text=True, timeout=60)
    assert "usage" in r.stdout
