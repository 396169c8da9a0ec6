# Environment for the dockerized tracking stack (docker/docker-compose.yaml):
# MinIO artifact store credentials + endpoint, sourced before any stage CLI
# when MLFLOW_TRACKING_URI points at the server instead of the local mlruns/
# file store (reference config/exports.bash).
set -a
AWS_ACCESS_KEY_ID=minioadmin
AWS_SECRET_ACCESS_KEY=minioadmin
MLFLOW_S3_ENDPOINT_URL=http://localhost:9000
# MLFLOW_TRACKING_URI=http://localhost:5000
set +a
