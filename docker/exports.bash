# Point the pipeline at the dockerized tracking stack
# (role of reference config/exports.bash):
#
#   source docker/exports.bash

export MLFLOW_TRACKING_URI=http://localhost:5000
export AWS_ACCESS_KEY_ID=minioadmin
export AWS_SECRET_ACCESS_KEY=minioadmin
export MLFLOW_S3_ENDPOINT_URL=http://localhost:9000
