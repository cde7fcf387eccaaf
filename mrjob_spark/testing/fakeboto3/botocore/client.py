"""botocore.client stub (the reference only type-annotates with these)."""


class Config:
    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)


class BaseClient:
    pass
