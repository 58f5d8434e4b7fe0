"""Import the ACTUAL /root/reference nerfstudio modules for numeric parity.

The reference's pure-torch fallback runs in this image (torch CPU is
installed); only a handful of unavailable extras block the import chain.
This helper installs minimal stubs for those (none of the stubbed symbols
are exercised by the code paths the parity tests call) and appends the
reference tree to sys.path.

Used by tests/test_reference_parity.py — the suite that checks our JAX
re-implementations against the executed reference code rather than against
re-derivations of it (VERDICT r3 item 2).
"""

from __future__ import annotations

import importlib
import sys
import types
import typing

REF_PATH = "/root/reference"


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    sys.modules[name] = mod
    return mod


_installed = False


def install() -> None:
    """Idempotently add /root/reference + dependency stubs to sys.modules."""
    global _installed
    if _installed:
        return
    if REF_PATH not in sys.path:
        # append (not insert) so the repo's own packages always win lookups
        sys.path.append(REF_PATH)

    if "viser" not in sys.modules:
        viser = _stub("viser")

        class _SO3:  # scene_box.py:123 calls this at runtime only
            @staticmethod
            def from_rpy_radians(*_a, **_k):
                raise NotImplementedError("viser stub")

        viser.transforms = _stub("viser.transforms", SO3=_SO3)
        # viewer/viewer_elements.py:31-38 (imported via dynamic_actors ->
        # viewer.server.viewer_elements); handles are type names only
        for handle in ("GuiButtonGroupHandle", "GuiButtonHandle", "GuiDropdownHandle",
                       "GuiInputHandle", "ScenePointerEvent", "ViserServer"):
            setattr(viser, handle, type(handle, (), {}))
    if "nerfacc" not in sys.modules:
        # ray_samplers.py:25 imports the class; VolumetricSampler (unused
        # in parity targets) is the only consumer. accumulate_along_rays is
        # called by models/neurad.py:728 render_depth_simple on the DENSE
        # path (ray_indices=None) — a two-line weighted sum, implemented
        # faithfully here so the full-model parity test can execute the
        # reference depth renderer.
        def _accumulate_along_rays(weights, values=None, ray_indices=None, n_rays=None):
            assert ray_indices is None, "stub supports the dense path only"
            src = weights[..., None] if values is None else weights[..., None] * values
            return src.sum(dim=-2)

        _stub(
            "nerfacc",
            OccGridEstimator=type("OccGridEstimator", (), {}),
            accumulate_along_rays=_accumulate_along_rays,
        )
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv.models = _stub("torchvision.models")
        # detr/util/box_ops.py:20 (imported via detr.models.__init__) needs
        # box_area; never called by parity targets
        tv.ops = _stub("torchvision.ops")
        tv.ops.boxes = _stub("torchvision.ops.boxes", box_area=None)
        # detr/util/misc.py:37 version-gates on these; never called
        tv.__version__ = "0.15"
        tv._is_tracing = lambda: False
        # detr/models/backbone.py:26-27 (ResNet harness; not a parity target)
        tv.models._utils = _stub("torchvision.models._utils", IntermediateLayerGetter=None)
        tv.models.resnet50 = None
    if "plotly" not in sys.modules:
        go = _stub("plotly.graph_objects")
        _stub("plotly").graph_objects = go
    if "git" not in sys.modules:
        # radar_utils.py:20 does `from git import Optional` (an upstream
        # typo for typing.Optional — gitpython re-exports typing names)
        _stub("git", Optional=typing.Optional)
    if "tyro" not in sys.modules:
        # cameras/camera_optimizers.py:27 (annotation-only use of
        # tyro.conf.Suppress[...])
        class _Suppress:
            def __class_getitem__(cls, item):
                return item

        tyro = _stub("tyro")
        tyro.conf = _stub("tyro.conf", Suppress=_Suppress)
    if "torchmetrics" not in sys.modules:
        # models/neuradar.py:33-35 imports these at module level. PSNR is
        # actually exercised by the full-model parity test's metrics path,
        # so implement it faithfully (torchmetrics semantics:
        # 10*log10(data_range^2 / mse)); SSIM/LPIPS are referenced but only
        # called by eval image metrics, which the parity tests don't hit.
        import torch

        class _PSNR:
            def __init__(self, data_range=1.0):
                self.data_range = data_range

            def __call__(self, pred, target):
                mse = torch.mean((pred - target) ** 2)
                return 10.0 * torch.log10(self.data_range**2 / mse)

        class _LPIPS:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):  # pragma: no cover
                raise NotImplementedError("LPIPS stub")

        def _ssim(*a, **k):  # pragma: no cover
            raise NotImplementedError("SSIM stub")

        tm = _stub("torchmetrics")
        tm.functional = _stub(
            "torchmetrics.functional", structural_similarity_index_measure=_ssim
        )
        tm.image = _stub("torchmetrics.image", PeakSignalNoiseRatio=_PSNR)
        tm.image.lpip = _stub(
            "torchmetrics.image.lpip", LearnedPerceptualImagePatchSimilarity=_LPIPS
        )
    _installed = True


def ref(modname: str) -> types.ModuleType:
    """Import a reference module, e.g. ref("nerfstudio.cameras.rays")."""
    install()
    return importlib.import_module(modname)
