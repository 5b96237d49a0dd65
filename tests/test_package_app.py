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


def test_bundle_native_lib_is_loadable(tmp_path, monkeypatch):
    """The launcher points CSDR_NATIVE_LIB at the bundled .so; load_lib must
    honor it (inside the zipapp, the repo-relative path never exists —
    regression: deployed bundles silently lost native IO)."""
    out = build_bundle(str(tmp_path / "dist"))
    launcher = open(os.path.join(out, "csdr")).read()
    assert 'CSDR_NATIVE_LIB="$HERE/lib/libcsdr_io.so"' in launcher
    so = os.path.join(out, "lib", "libcsdr_io.so")
    if not os.path.exists(so):
        import pytest
        pytest.skip("native lib was not built on this host")
    import csdr_tpu.io.native as native

    monkeypatch.setenv("CSDR_NATIVE_LIB", so)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    lib = native.load_lib()
    assert lib is not None
    monkeypatch.setattr(native, "_lib", None)  # don't leak the bundle's lib


def test_native_lib_env_missing_path_raises(monkeypatch):
    import pytest

    import csdr_tpu.io.native as native

    monkeypatch.setenv("CSDR_NATIVE_LIB", "/nonexistent/libcsdr_io.so")
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
    with pytest.raises(RuntimeError, match="nonexistent"):
        native.load_lib()
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_build_failed", False)
