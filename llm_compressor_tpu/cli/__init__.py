from .args import build_parser
from .main import run_pipeline

__all__ = ["build_parser", "run_pipeline"]
