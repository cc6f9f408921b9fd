from .discount_curve import DiscountCurve
from .interpolator import Interpolator, InterpolatorAd, interpolate
from .inflation_curve import InflationCurve, ZCIS_TOL
