from . import bootstrap, interpolation, pricers
