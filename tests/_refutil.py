"""Shared helper: import the reference's torch modules with GPU-only deps
stubbed (used by test_reference_parity.py and test_convert_reference.py)."""
import sys
import types

REF = '/root/reference/src'


def import_reference():
    """Returns a namespace of reference modules, or raises ImportError."""
    import torch

    def stub(name, attrs=()):
        m = types.ModuleType(name)
        for a in attrs:
            setattr(m, a, type(a, (), {}) if a[0].isupper()
                    else (lambda *x, **k: None))
        sys.modules.setdefault(name, m)
        return sys.modules[name]

    nib = stub('nibabel')
    nib.quaternions = stub('nibabel.quaternions', ['quat2mat', 'mat2quat'])
    me = stub('MinkowskiEngine', ['SparseTensor', 'MinkowskiConvolution',
                                  'MinkowskiBatchNorm', 'MinkowskiReLU',
                                  'MinkowskiNetwork', 'MinkowskiModuleBase'])
    me.utils = stub('MinkowskiEngine.utils',
                    ['sparse_quantize', 'batched_coordinates'])
    stub('pytorch3d')
    stub('pytorch3d.ops', ['ball_query', 'knn_points', 'packed_to_padded',
                           'sample_farthest_points'])
    stub('open3d')
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.transformer import transformers as ref_tf
    from models.losses import feature_loss as ref_fl
    from models import qk_regtr_full as ref_model
    from models.backbone_kpconv import kpconv_blocks as ref_kp
    from utils import se3_torch as ref_se3
    torch.manual_seed(0)
    return types.SimpleNamespace(torch=torch, tf=ref_tf, fl=ref_fl,
                                 se3=ref_se3, model=ref_model, kp=ref_kp)
