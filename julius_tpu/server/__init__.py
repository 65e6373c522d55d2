"""Network servers: module control/result protocol, adinnet audio input."""
