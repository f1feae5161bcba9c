"""Plan assembly: flagship pipeline (EP1) + oracle-checkable derived inputs."""
