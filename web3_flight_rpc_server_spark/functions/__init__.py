from .hashing import MD5_PREFIX60_SQL, md5_prefix60  # noqa: F401
from .rounding import ORACLE_ROUND4, round4  # noqa: F401
