"""Short import alias: ``import rodc_tpu`` ->
``rapidobjectdetectionusingcascadedcnns_tpu``."""

import sys

import rapidobjectdetectionusingcascadedcnns_tpu as _pkg

sys.modules[__name__] = _pkg
