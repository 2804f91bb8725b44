"""The declared query catalog: every entry pairs a Spark DataFrame
builder with a DuckDB oracle-SQL twin (SURVEY.md §2.10)."""

from .core import ORACLE, QUERIES
from . import llm as _llm  # noqa: F401  (registers q17-q24 into QUERIES/ORACLE)
from . import ops as _ops  # noqa: F401  (registers q25-q28)
from . import ext as _ext  # noqa: F401  (registers q29-q31)
from . import extra as _extra  # noqa: F401  (registers q37-q43, q51, q67-q68)
from . import curation as _cur  # noqa: F401  (registers q44-q50)
from . import cleaning as _cln  # noqa: F401  (registers q55-q57, q64, q69-q71)
from . import training as _trn  # noqa: F401  (registers q58-q63, q65-q66)
from . import mining as _mng  # noqa: F401  (registers q72-q79)
from . import corpus as _crp  # noqa: F401  (registers q80-q98)
from . import platform as _plt  # noqa: F401  (registers q99-q123)
from . import evalsuite as _evl  # noqa: F401  (registers q124-q133)
from . import analysis as _ana  # noqa: F401  (registers q134-q145)
from . import measures as _msr  # noqa: F401  (registers q146-q157)
from . import business as _biz  # noqa: F401  (registers q158-q162)
from . import warehouse as _wh  # noqa: F401  (registers q163-q182)
from . import traindata as _td  # noqa: F401  (registers q183-q192)

__all__ = ["QUERIES", "ORACLE"]
