from .requests import ClientRequest, RequestMode, plan_request  # noqa: F401
