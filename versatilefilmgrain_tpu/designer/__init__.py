"""Interactive FGC SEI grain designer (capability port of the reference's
fgc-designer.py tool, D1-D4 in SURVEY.md section 2.5).

Unlike the reference tool, which shells out to the ``vfgs`` binary for every
preview (fgc-designer.py:877-885), this designer calls the TPU grain pipeline
in-process, so previews are interactive-rate.

Headless-safe: importing this package never pulls in Tk; the GUI only loads
from :func:`versatilefilmgrain_tpu.designer.app.main`.
"""

from .model import FgcSeiDesign
from .preview import read_yuv_frame, upsample_chroma, yuv_to_rgb

__all__ = ["FgcSeiDesign", "read_yuv_frame", "upsample_chroma", "yuv_to_rgb"]
