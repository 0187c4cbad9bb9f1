"""Text logging for the framework (replacement for ``nemo.utils.logging``)."""

import logging as _logging
import sys

_logger = _logging.getLogger("diffusion_model_nemo_tpu")
if not _logger.handlers:
    _handler = _logging.StreamHandler(sys.stdout)
    _handler.setFormatter(
        _logging.Formatter("[dmn-tpu %(levelname)s %(asctime)s] %(message)s", "%H:%M:%S")
    )
    _logger.addHandler(_handler)
    _logger.setLevel(_logging.INFO)
    _logger.propagate = False

info = _logger.info
warning = _logger.warning
error = _logger.error
debug = _logger.debug
setLevel = _logger.setLevel
