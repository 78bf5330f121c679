"""Load the reference PyTorch Unicorn (from /root/reference) on torch-cpu as a
parity oracle.

The reference package top-level __init__ pulls GPU/eval-only deps (loguru,
torchvision, timm, easydict, compiled MSDA). We import only the model modules
through a parent-package shim and stub those deps with minimal equivalents;
the CUDA deformable-attention op is replaced by the reference's own pure-torch
`ms_deform_attn_core_pytorch` (unicorn/models/ops/functions/
ms_deform_attn_func.py:41-62), exactly as its ops test does
(unicorn/models/ops/test.py:31-61).

Nothing here is imported by the production package; it exists so
tests/test_torch_parity.py can assert whole-network numerical parity.
"""
from __future__ import annotations

import sys
import types

REF_ROOT = "/root/reference"

_loaded = {}


def _stub(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)
    return sys.modules[name]


def load_reference():
    """Returns a namespace of reference model classes/builders, or raises
    ImportError if the reference tree is unavailable."""
    if _loaded:
        return _loaded["ns"]

    import os

    if not os.path.isdir(REF_ROOT):
        raise ImportError(f"reference tree not found at {REF_ROOT}")

    import torch

    # ---- dependency stubs (minimal, eval-time-equivalent) ----
    class _FakeLogger:
        def __getattr__(self, k):
            return lambda *a, **kw: None

    _stub("loguru", logger=_FakeLogger())
    _stub("MultiScaleDeformableAttention")

    class _DropPath(torch.nn.Module):  # identity at eval / drop_prob=0
        def __init__(self, drop_prob=None):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def _trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return t.normal_(mean, std).clamp_(a * std, b * std)

    timm = _stub("timm")
    timm_models = _stub("timm.models")
    timm_layers = _stub("timm.models.layers", DropPath=_DropPath,
                        to_2tuple=_to_2tuple, trunc_normal_=_trunc_normal_)
    timm.models = timm_models
    timm_models.layers = timm_layers

    class _EasyDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

    _stub("easydict", EasyDict=_EasyDict)

    import copy as _copy

    class _CfgNode(dict):  # yacs stand-in (swin config is built but unused)
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

        def __setattr__(self, k, v):
            self[k] = v

        def clone(self):
            return _copy.deepcopy(self)

        def freeze(self, *a, **kw):
            pass

        defrost = merge_from_list = merge_from_other_cfg = freeze

    yacs = _stub("yacs")
    yacs_config = _stub("yacs.config", CfgNode=_CfgNode)
    yacs.config = yacs_config

    def _box_iou(a, b):  # torchvision.ops.box_iou (xyxy, exclusive)
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        tl = torch.maximum(a[:, None, :2], b[None, :, :2])
        br = torch.minimum(a[:, None, 2:], b[None, :, 2:])
        inter = (br - tl).clamp(min=0).prod(-1)
        return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)

    def _nms(boxes, scores, iou_threshold):
        # torchvision.ops.nms semantics: greedy by descending score, drop
        # boxes with IoU > threshold vs a kept box
        order = torch.argsort(scores, descending=True)
        keep = []
        while order.numel():
            i = order[0]
            keep.append(i)
            if order.numel() == 1:
                break
            ious = _box_iou(boxes[i: i + 1], boxes[order[1:]])[0]
            order = order[1:][ious <= iou_threshold]
        return torch.stack(keep) if keep else torch.zeros(0, dtype=torch.long)

    def _batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.zeros(0, dtype=torch.long)
        offs = idxs.to(boxes) * (boxes.max() + 1)
        return _nms(boxes + offs[:, None], scores, iou_threshold)

    tv = _stub("torchvision")
    tv_ops = _stub("torchvision.ops", box_iou=_box_iou, nms=_nms,
                   batched_nms=_batched_nms)
    tv.ops = tv_ops

    # parent-package shim: unicorn/__init__ pulls torchvision etc.; models/*
    # only needs unicorn.utils.bboxes_iou (loss path — unused at eval)
    pkg = types.ModuleType("unicorn")
    pkg.__path__ = [os.path.join(REF_ROOT, "unicorn")]
    sys.modules.setdefault("unicorn", pkg)

    def _bboxes_iou(a, b, xyxy=True):
        """unicorn/utils/boxes.py bboxes_iou semantics (YOLOX): pairwise IoU;
        xyxy=False means cxcywh boxes (the SimOTA call path)."""
        if xyxy:
            tl = torch.max(a[:, None, :2], b[None, :, :2])
            br = torch.min(a[:, None, 2:], b[None, :, 2:])
            area_a = torch.prod(a[:, 2:] - a[:, :2], 1)
            area_b = torch.prod(b[:, 2:] - b[:, :2], 1)
        else:
            tl = torch.max(a[:, None, :2] - a[:, None, 2:] / 2,
                           b[None, :, :2] - b[None, :, 2:] / 2)
            br = torch.min(a[:, None, :2] + a[:, None, 2:] / 2,
                           b[None, :, :2] + b[None, :, 2:] / 2)
            area_a = torch.prod(a[:, 2:], 1)
            area_b = torch.prod(b[:, 2:], 1)
        en = (tl < br).type(tl.type()).prod(dim=2)
        area_i = torch.prod(br - tl, 2) * en
        return area_i / (area_a[:, None] + area_b[None, :] - area_i + 1e-16)

    _stub("unicorn.utils", bboxes_iou=_bboxes_iou)

    from unicorn.models.ops.functions import ms_deform_attn_func as _f
    from unicorn.models.ops.modules import ms_deform_attn as _m

    class _PurePyMSDA:
        """Drop-in for the compiled MSDA autograd Function (forward only)."""

        @staticmethod
        def apply(value, shapes, start_index, loc, weights, step):
            return _f.ms_deform_attn_core_pytorch(value, shapes, loc, weights)

    _m.MSDeformAttnFunction = _PurePyMSDA

    # deformable_transformer.py:71 and unicorn_head.py's zero-grad trick
    # hardcode device="cuda"; shim those modules' torch bindings to cpu
    import unicorn.models.deformable_transformer as _dt

    class _TorchShim:
        def __getattr__(self, k):
            return getattr(torch, k)

        @staticmethod
        def zeros(*a, **kw):
            if kw.get("device") == "cuda":
                kw["device"] = "cpu"
            return torch.zeros(*a, **kw)

        @staticmethod
        def tensor(*a, **kw):
            if kw.get("device") == "cuda":
                kw["device"] = "cpu"
            return torch.tensor(*a, **kw)

    _dt.torch = _TorchShim()
    import unicorn.models.unicorn_head as _uh

    _uh.torch = _TorchShim()
    # eval-path device="cuda" hardcodes in the mask stack
    # (condinst/dynamic_mask_head.py:186, unicorn_head_mask.py:389)
    import unicorn.models.condinst.dynamic_mask_head as _dmh

    _dmh.torch = _TorchShim()
    import unicorn.models.unicorn_head_mask as _uhm

    _uhm.torch = _TorchShim()

    from unicorn.models.unicorn import Unicorn
    from unicorn.models.backbone.yolo_pafpn_new import YOLOPAFPNNEW
    from unicorn.models.unicorn_head import UnicornHead
    from unicorn.models.deformable_transformer import (
        build_deforamble_transformer,
    )
    from unicorn.models.position_encoding import build_position_encoding

    from unicorn.tracker.quasi_dense_embed_tracker import (
        QuasiDenseEmbedTracker,
    )
    from unicorn.models.unicorn_head_mask import UnicornHeadMask

    ns = types.SimpleNamespace(
        torch=torch,
        Unicorn=Unicorn,
        YOLOPAFPNNEW=YOLOPAFPNNEW,
        UnicornHead=UnicornHead,
        UnicornHeadMask=UnicornHeadMask,
        build_deforamble_transformer=build_deforamble_transformer,
        build_position_encoding=build_position_encoding,
        QuasiDenseEmbedTracker=QuasiDenseEmbedTracker,
    )
    _loaded["ns"] = ns
    return ns


def load_reference_trackers():
    """Import the reference's external SOT/VOS tracker classes
    (external/lib/test/tracker/unicorn_{sot,vos}.py) on torch-cpu, unmodified
    — their initialize/track/get_det_results protocol logic is the code under
    test in tests/test_protocol_parity.py. Only environment shims are applied:
    cuda->cpu redirection, the removed np.int alias, and dependency stubs for
    the harness imports their module headers pull."""
    if "trackers" in _loaded:
        return _loaded["trackers"]
    load_reference()

    import importlib.util
    import os

    import numpy as np
    import torch

    if not hasattr(np, "int"):  # removed in numpy>=1.24; the 2022 ref uses it
        np.int = int
    if not getattr(torch.Tensor.cuda, "_cpu_shim", False):
        def _cuda(self, *a, **kw):
            return self

        _cuda._cpu_shim = True
        torch.Tensor.cuda = _cuda

    class BaseTracker:
        def __init__(self, params=None):
            self.params = params

    lib = _stub("lib")
    lib_test = _stub("lib.test")
    lib_tracker = _stub("lib.test.tracker")
    lib.test = lib_test
    lib_test.tracker = lib_tracker
    lib_tracker.basetracker = _stub("lib.test.tracker.basetracker",
                                    BaseTracker=BaseTracker)
    _stub("unicorn.exp", get_exp=None)  # module-level import only; the
    # parity tests bypass __init__ (which would need exp files + checkpoints)

    def _load(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    if "unicorn.utils.boxes" not in sys.modules:
        boxes = _load("unicorn.utils.boxes",
                      os.path.join(REF_ROOT, "unicorn/utils/boxes.py"))
        sys.modules["unicorn.utils"].boxes = boxes

    class _TorchCPUShim:
        """torch facade redirecting hardcoded device='cuda' to cpu."""

        def __getattr__(self, k):
            return getattr(torch, k)

        @staticmethod
        def _fix(kw):
            if kw.get("device") == "cuda":
                kw["device"] = "cpu"
            return kw

        def zeros(self, *a, **kw):
            return torch.zeros(*a, **self._fix(kw))

        def tensor(self, *a, **kw):
            return torch.tensor(*a, **self._fix(kw))

        def full(self, *a, **kw):
            return torch.full(*a, **self._fix(kw))

    tdir = os.path.join(REF_ROOT, "external/lib/test/tracker")
    sot = _load("ref_tracker_unicorn_sot", os.path.join(tdir, "unicorn_sot.py"))
    vos = _load("ref_tracker_unicorn_vos", os.path.join(tdir, "unicorn_vos.py"))
    sot.torch = _TorchCPUShim()
    vos.torch = _TorchCPUShim()

    ns = types.SimpleNamespace(sot=sot, vos=vos)
    _loaded["trackers"] = ns
    return ns


def make_reference_sot_tracker(model, input_size, max_inst=3,
                               conf_thre=0.001, nms_thre=0.65):
    """UnicornSOTTrack with __init__ bypassed (no exp files / checkpoints /
    cuda): the fields unicorn_sot.py:16-37 would set are set directly, then
    initialize/track run the reference's own protocol code on torch-cpu."""
    ns = load_reference_trackers()
    t = ns.sot.UnicornSOTTrack.__new__(ns.sot.UnicornSOTTrack)
    t.params = None
    t.num_classes = 1
    t.input_size = tuple(input_size)
    t.confthre = conf_thre
    t.nmsthre = nms_thre
    t.max_inst = max_inst
    t.model = model
    t.device = "cpu"
    t.preprocessor = ns.sot.PreprocessorX(normalize=False)
    t.state = None
    t.frame_id = 0
    return t


def make_reference_vos_tracker(model, input_size, max_inst=1,
                               conf_thre=0.001, nms_thre=0.65,
                               d_rate=2, use_raft=True):
    """UnicornVOSTrack with __init__ bypassed (unicorn_vos.py:14-41).
    d_rate=2 matches exp.d_rate (unicorn_det_mask.py:29, up_rate=8//d_rate=4,
    i.e. our use_raft/up_rate=4 mask model)."""
    ns = load_reference_trackers()
    t = ns.vos.UnicornVOSTrack.__new__(ns.vos.UnicornVOSTrack)
    t.params = None
    t.soft_aggregate = True
    t.num_classes = 1
    t.input_size = tuple(input_size)
    t.confthre = conf_thre
    t.nmsthre = nms_thre
    t.max_inst = max_inst
    t.mask_thres = 0.30
    t.d_rate = d_rate
    t.use_raft = use_raft
    t.model = model
    t.device = "cpu"
    t.preprocessor = ns.vos.PreprocessorX(normalize=False)
    t.state = None
    t.frame_id = 0
    return t


def convert_bn_to_gn(module, num_groups=16):
    """Reference exp/unicorn_track.py:450-470 semantics: every BatchNorm2d
    becomes GroupNorm(num_groups, C, eps=bn.eps) carrying over affine params."""
    import torch.nn as nn

    mod = module
    if isinstance(module, nn.modules.batchnorm._BatchNorm):
        mod = nn.GroupNorm(num_groups, module.num_features,
                           eps=module.eps, affine=module.affine)
        if module.affine:
            mod.weight.data = module.weight.data.clone().detach()
            mod.bias.data = module.bias.data.clone().detach()
    for name, child in module.named_children():
        mod.add_module(name, convert_bn_to_gn(child, num_groups=num_groups))
    return mod


def build_reference_tiny(num_classes=8, seed=0, with_mask=False,
                         backbone_name="convnext",
                         in_channels=(192, 384, 768)):
    """Build the reference unicorn_track_tiny model (convnext_tiny, deform
    interaction) on CPU, GN-converted, eval mode, deterministic weights.

    Mirrors unicorn/exp/unicorn_track.py:115-193 minus checkpoint loading;
    with_mask builds the UnicornHeadMask variant
    (unicorn_track_mask.py:58-64: ctrl_loc=reg, use_raft, up_rate=4).
    backbone_name/in_channels follow the reference exp overrides —
    ("convnext_large", [384, 768, 1536]) is unicorn_track_large
    (exps/default/unicorn_track_large.py:14-16).
    """
    ns = load_reference()
    torch = ns.torch
    torch.manual_seed(seed)
    in_channels = list(in_channels)
    backbone = ns.YOLOPAFPNNEW(
        1.0, 1.0, in_channels=in_channels, act="silu",
        backbone_name=backbone_name, use_checkpoint=False)
    if with_mask:
        head = ns.UnicornHeadMask(
            num_classes, 1.0, in_channels=in_channels, act="silu",
            use_l1=False, use_attention=True, n_layer_att=3,
            unshared_obj=True, unshared_reg=True, mot_weight=3,
            scale_all_mot=True, fuse_method="sum", learnable_fuse=True,
            ctrl_loc="reg", sem_loss_on=False, use_raft=True, up_rate=4)
    else:
        head = ns.UnicornHead(
        num_classes, 1.0, in_channels=in_channels, act="silu",
        use_l1=False, use_attention=True, n_layer_att=3,
        unshared_obj=True, unshared_reg=True, mot_weight=3,
        scale_all_mot=True, fuse_method="sum", learnable_fuse=True)
    transformer = ns.build_deforamble_transformer()
    pos_embed = ns.build_position_encoding()
    model = ns.Unicorn(backbone, head, pos_embed, transformer,
                       bidirect=True, grid_sample=True, mhs=True,
                       embed_dim=128, scale_all_mot=True, mot_weight=3,
                       interact_mode="deform")

    import torch.nn as nn

    def init_yolo(M):
        for m in M.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.eps = 1e-3
                m.momentum = 0.03

    model.apply(init_yolo)
    model.head.initialize_biases(1e-2)
    # randomize every parameter so parity is non-trivial (fresh init leaves
    # many zeros/constants that would mask transposition bugs)
    g = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for p in model.parameters():
            p.add_(0.02 * torch.randn(p.shape, generator=g))
    model = convert_bn_to_gn(model, num_groups=16)
    model.eval()
    return model
