"""L2b F0 predictors: dio (WORLD DIO+StoneMask port), harvest (WORLD
Harvest port), pm (Praat-style autocorrelation), yin, and the NN trackers
crepe/rmvpe/fcpe (JAX ports with weight converters)."""

from .base import F0Predictor, get_f0_predictor
from .dio import DioF0Predictor, HarvestF0Predictor
from .praat import ParselmouthF0Predictor
from .yin import YinF0Predictor
