from .flight_server import EngineFlightServer  # noqa: F401
