"""pysyslog — a from-scratch PySpark-native syslog analytics engine.

Parse surface ⇔ reyjrar/Parse-Syslog-Line (reference at /root/reference,
studied for behavior only); execution model is Spark DataFrames +
Arrow-vectorized UDFs (see SURVEY.md).
"""

from .options import ParserOptions, options_from_perl, psl_enable_sdata
from .parser_core import SyslogParser, parse_syslog_lines
from .tables import preamble_priority, preamble_facility

__all__ = [
    "ParserOptions",
    "options_from_perl",
    "psl_enable_sdata",
    "SyslogParser",
    "parse_syslog_lines",
    "preamble_priority",
    "preamble_facility",
]

__version__ = "0.1.0"
