from .incremental import IncrementalRunner, available_now_stream  # noqa: F401
from .stateful import wallet_state_stream  # noqa: F401
from .scheduler import SchedulerSpec, retry, retry_call  # noqa: F401
