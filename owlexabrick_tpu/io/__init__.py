from . import formats
from .config import Config, parse_config
from .expression import evaluate_postfix
