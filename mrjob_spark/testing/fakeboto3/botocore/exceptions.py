"""Just enough of botocore.exceptions for the reference to run against
the mock services (see fakeboto3/boto3/__init__.py)."""


class BotoCoreError(Exception):
    pass


class NoCredentialsError(BotoCoreError):
    pass


class ClientError(Exception):
    """Real shape: ``.response['Error']['Code']`` + HTTP status, which is
    what ``mrjob/aws.py`` / ``mrjob/fs/s3.py`` read off caught errors."""

    def __init__(self, error_response, operation_name=""):
        self.response = error_response or {}
        self.operation_name = operation_name
        err = (self.response.get("Error") or {})
        super().__init__(
            "An error occurred (%s) when calling the %s operation: %s"
            % (err.get("Code", "Unknown"), operation_name or "?",
               err.get("Message", ""))
        )
