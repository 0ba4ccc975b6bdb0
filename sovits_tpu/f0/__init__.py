"""L2b F0 predictors: dio/harvest (DIO-family reimplementation), pm
(Boersma autocorrelation), yin, crepe (JAX port of the CNN)."""

from .base import F0Predictor, get_f0_predictor
from .dio import DioF0Predictor, HarvestF0Predictor
from .praat import ParselmouthF0Predictor
from .yin import YinF0Predictor
