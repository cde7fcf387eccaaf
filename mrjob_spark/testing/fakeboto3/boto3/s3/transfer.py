"""boto3.s3.transfer stub — the mock store copies files whole, so the
multipart knobs are accepted and ignored."""


class TransferConfig:
    def __init__(self, **kwargs):
        self.__dict__.update(kwargs)
